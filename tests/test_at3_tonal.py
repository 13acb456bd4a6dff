"""ATRAC3 tonal-component tests: golden cross-validation vs the reference.

tests/golden/at3_tonal_golden.npz was produced by the reference oracle with
tonal components enabled (--nogaincontrol only).  The extraction decisions
(which BFUs, which runs, quantizers, scale factors) must match exactly.
"""
import os

import numpy as np
import pytest

from atracdenc_tpu.models.atrac3 import frame as at3_frame
from atracdenc_tpu.models.atrac3.encoder import encode_track

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden():
    data = np.load(os.path.join(GOLDEN, "at3_tonal_golden.npz"))
    return data["pcm_in"], data["ref_frames"]


@pytest.fixture(scope="module")
def encoded(golden):
    pcm, _ = golden
    planes = encode_track(pcm, frame_bytes=384, no_tonal=False)
    return planes, at3_frame.pack(planes, 384)


def test_byte_identity_vs_reference(golden, encoded):
    _, ref_frames = golden
    _, ours = encoded
    identity = (ours == ref_frames).mean()
    assert identity > 0.99, f"byte identity {identity:.4f}"


def test_tonal_selections_match_reference(golden, encoded):
    _, ref_frames = golden
    planes, _ = encoded
    parsed = at3_frame.unpack(ref_frames, 2)
    n_tonal = 0
    for f, chans in enumerate(parsed):
        for ch, r in enumerate(chans):
            ref_tc = sorted(
                (t["pos"], t["quant"], len(t["mant"]), t["sfi"])
                for t in r["tonal"])
            act = planes["tonal_active"][ch, f]
            ours_tc = sorted(
                (int(planes["tonal_start"][ch, f, b]),
                 int(planes["tonal_quant"][ch, f, b]),
                 int(planes["tonal_len"][ch, f, b]),
                 int(planes["tonal_sfi"][ch, f, b]))
                for b in range(32) if act[b])
            assert ref_tc == ours_tc, f"frame {f} ch {ch}"
            n_tonal += len(ref_tc)
    assert n_tonal > 0, "golden input produced no tonal components"


def test_dense_tonal_cross_bfu_merging():
    """Tonal runs merge across BFU boundaries into blocks of <=7
    (MapTonalComponents); pinned with a dense multi-tone golden input."""
    data = np.load(os.path.join(GOLDEN, "at3_tonal_dense_golden.npz"))
    pcm, ref = data["pcm_in"], data["ref_frames"]
    planes = encode_track(pcm, frame_bytes=384, no_tonal=False)
    ours = at3_frame.pack(planes, 384)
    ident = (ours == ref).mean()
    assert ident > 0.97, f"byte identity {ident:.4f}"
    # at least one coded block must exceed the 5-coefficient extraction cap
    assert (planes["tonal_len"] > 5).any()
