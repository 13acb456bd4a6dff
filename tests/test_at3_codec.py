"""ATRAC3 encoder tests: golden cross-validation against the reference.

tests/golden/at3_golden.npz holds an input PCM batch and the frames produced
for it by the *reference* ATRAC3 encoder (compiled from /root/reference as an
offline oracle, mode: --nogaincontrol --notonal, 132300 bit/s LP2).  The
encoder pipelines differ only at float rounding knife-edges, so structural
planes must match exactly and bytes near-exactly.
"""
import os

import numpy as np
import pytest

from atracdenc_tpu.models.atrac3 import frame as at3_frame
from atracdenc_tpu.models.atrac3 import tables as T
from atracdenc_tpu.models.atrac3.encoder import encode_track

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden():
    data = np.load(os.path.join(GOLDEN, "at3_golden.npz"))
    return data["pcm_in"], data["ref_frames"]


@pytest.fixture(scope="module")
def encoded(golden):
    pcm, _ = golden
    planes = encode_track(pcm, frame_bytes=384)
    return planes, at3_frame.pack(planes, 384)


def test_byte_identity_vs_reference(golden, encoded):
    _, ref_frames = golden
    _, ours = encoded
    assert ours.shape == ref_frames.shape
    identity = (ours == ref_frames).mean()
    assert identity > 0.99, f"byte identity {identity:.4f}"


def test_structural_planes_match_reference(golden, encoded):
    _, ref_frames = golden
    planes, _ = encoded
    parsed = at3_frame.unpack(ref_frames, 2)
    total_mant = 0
    mant_diffs = 0
    for f, chans in enumerate(parsed):
        for ch, r in enumerate(chans):
            nb = planes["num_bfu"][ch, f]
            assert r["num_bfu"] == nb
            assert r["coding_mode"] == int(planes["coding_mode"][ch, f])
            assert (r["wordlen"][:nb] == planes["wordlen"][ch, f, :nb]).all()
            used = r["wordlen"][:nb] > 0
            assert (r["sfi"][:nb][used]
                    == planes["sfi"][ch, f, :nb][used]).all()
            for i in range(nb):
                if r["wordlen"][i]:
                    sz = T.SPECS_PER_BLOCK[i]
                    total_mant += sz
                    mant_diffs += int(
                        (r["mant"][i, :sz]
                         != planes["mant"][ch, f, i, :sz]).sum())
    # only float knife-edge rounding diffs allowed
    assert mant_diffs <= max(2, total_mant // 500), \
        f"{mant_diffs}/{total_mant} mantissa diffs"


def test_pack_unpack_roundtrip(encoded):
    planes, frames = encoded
    parsed = at3_frame.unpack(frames, 2)
    for f, chans in enumerate(parsed):
        for ch, r in enumerate(chans):
            nb = planes["num_bfu"][ch, f]
            assert r["num_bfu"] == nb
            assert (r["wordlen"][:nb] == planes["wordlen"][ch, f, :nb]).all()
            for i in range(nb):
                if r["wordlen"][i]:
                    sz = T.SPECS_PER_BLOCK[i]
                    assert (r["mant"][i, :sz]
                            == planes["mant"][ch, f, i, :sz]).all()


def test_mono_duplicates_channel_bytes():
    rng = np.random.default_rng(3)
    pcm = (0.3 * rng.standard_normal((1, 4096))).astype(np.float32)
    planes = encode_track(pcm, frame_bytes=384)
    frames = at3_frame.pack(planes, 384)
    assert frames.shape == (4, 384)
    assert (frames[:, :192] == frames[:, 192:]).all()
