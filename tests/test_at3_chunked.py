"""Chunked long-track encoding: bounded memory with carried state.

The carry state (QMF input tail, gain context, MDCT overlap half,
NextOverlapScale chain, sequential loudness IIR) makes chunked output
byte-identical to whole-track output for any chunk size.
"""
import numpy as np
import pytest

from atracdenc_tpu.models.atrac3 import frame as at3_frame
from atracdenc_tpu.models.atrac3.decoder import decode_track
from atracdenc_tpu.models.atrac3.encoder import encode_track

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def track():
    rng = np.random.default_rng(3)
    t = 1024 * 24
    n = np.arange(t)
    return np.clip(
        0.4 * np.sin(2 * np.pi * 997 * n / 44100)[None] * [[1.0], [0.8]]
        + 0.05 * rng.standard_normal((2, t)), -1, 1).astype(np.float32)


def test_chunked_matches_whole_track(track):
    whole = encode_track(track, no_gain_control=False, no_tonal=False)
    chunked = encode_track(track, no_gain_control=False, no_tonal=False,
                           chunk_frames=7)
    for k in whole:
        if k in ("clip_max", "loudness"):
            # raw-float planes; XLA tiles the spectral reductions
            # differently for whole-track vs chunk batch shapes, giving
            # ulp drift (see parallel/mesh.py:48).  If the drift ever
            # crossed an allocation knife edge the integer planes and
            # packed bytes below would diverge and still fail the test.
            np.testing.assert_allclose(whole[k], chunked[k], rtol=1e-5)
        elif k == "clip_count":
            assert np.abs(np.asarray(whole[k], np.int64)
                          - np.asarray(chunked[k], np.int64)).max() <= 2, k
        else:
            assert np.array_equal(whole[k], chunked[k]), k
    fw = at3_frame.pack(whole, 384)
    fc = at3_frame.pack(chunked, 384)
    assert (fw == fc).all()

    dec = decode_track(fc, 2)
    n = min(dec.shape[1], track.shape[1]) - 2048
    x = track[:, 1024:n].astype(np.float64)
    e = x - dec[:, 1024:n].astype(np.float64)
    p = 10 * np.log10((x ** 2).mean() / (e ** 2).mean())
    assert p > 15.0
