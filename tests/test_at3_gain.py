"""ATRAC3 gain-control tests: golden cross-validation vs the reference.

tests/golden/at3_default_golden.npz holds reference-oracle frames for the
encoder's DEFAULT mode (gain control + tonal components).  Gain decisions
are heavily tuned float heuristics; residual divergence is confined to
near-silent regions (float-noise knife edges), so the assertions are byte
identity + gain-curve identity thresholds plus exact decode-quality parity.
"""
import os

import numpy as np
import pytest

from atracdenc_tpu.models.atrac3 import frame as at3_frame
from atracdenc_tpu.models.atrac3.decoder import decode_track
from atracdenc_tpu.models.atrac3.encoder import encode_track

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _psnr(x, y):
    e = x - y
    return 10 * np.log10((x ** 2).mean() / max((e ** 2).mean(), 1e-20))


@pytest.fixture(scope="module")
def golden():
    return np.load(os.path.join(GOLDEN, "at3_default_golden.npz"))


def _curve_identity(planes, ref_frames):
    parsed = at3_frame.unpack(ref_frames, 2)
    match = total = 0
    for f, chans in enumerate(parsed):
        for ch, r in enumerate(chans):
            for b in range(4):
                ours = [(int(planes["gain_levels"][ch, f, b, p]),
                         int(planes["gain_locs"][ch, f, b, p]))
                        for p in range(int(planes["gain_npoints"][ch, f, b]))]
                total += 1
                match += r["gain"][b] == ours
    return match, total


def test_default_mode_byte_identity(golden):
    pcm, ref = golden["pcm_in"], golden["ref_frames"]
    planes = encode_track(pcm, no_gain_control=False, no_tonal=False)
    ours = at3_frame.pack(planes, 384)
    ident = (ours == ref).mean()
    assert ident > 0.98, f"byte identity {ident:.4f}"
    m, t = _curve_identity(planes, ref)
    assert m == t, f"gain curves {m}/{t}"


def test_stress_gain_curves_and_quality(golden):
    pcm, ref = golden["pcm_stress"], golden["ref_stress"]
    planes = encode_track(pcm, no_gain_control=False, no_tonal=False)
    ours = at3_frame.pack(planes, 384)
    ident = (ours == ref).mean()
    assert ident > 0.85, f"byte identity {ident:.4f}"
    m, t = _curve_identity(planes, ref)
    assert m / t > 0.94, f"gain curves {m}/{t}"

    dec_ref = decode_track(ref, 2)
    dec_ours = decode_track(ours, 2)
    n = min(dec_ref.shape[1], pcm.shape[1]) - 2048
    x = pcm[:, 1024:n].astype(np.float64)
    p_ref = _psnr(x, dec_ref[:, 1024:n].astype(np.float64))
    p_ours = _psnr(x, dec_ours[:, 1024:n].astype(np.float64))
    assert p_ours > p_ref - 0.05, f"ours {p_ours:.2f} vs ref {p_ref:.2f} dB"
