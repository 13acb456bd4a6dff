"""AT1 chunked encode must be bit-identical to whole-track encode.

Pins the CHUNK_LEFT/CHUNK_RIGHT window bounds (QMF-tree FIR reach, MDCT
stored half, transient prev-block seed, loudness IIR carry — reference:
src/atrac1denc.cpp:180-255, transient_detector.h:30-50).
"""
import numpy as np
import pytest

from atracdenc_tpu.models.atrac1.encoder import encode_track

pytestmark = pytest.mark.slow


def _assert_planes_equal(whole, chunked):
    """Encoded planes must be byte-identical.  The clip_* diagnostics are
    raw-float telemetry off the MDCT spectra: XLA tiles the reduction
    differently for whole-track vs chunked batch shapes, giving 1-ulp
    drift (same reason parallel/mesh.py:48 strips them from sharded
    comparisons) — compare those to tolerance instead."""
    assert whole.keys() == chunked.keys()
    for k in whole:
        if k == "clip_max":
            np.testing.assert_allclose(whole[k], chunked[k], rtol=1e-5)
        elif k == "clip_count":
            assert np.abs(np.asarray(whole[k], np.int64)
                          - np.asarray(chunked[k], np.int64)).max() <= 2, k
        else:
            assert np.array_equal(whole[k], chunked[k]), k


def _pcm(frames, seed=9):
    t = 512 * frames
    rng = np.random.default_rng(seed)
    n = np.arange(t)
    sig = (0.4 * np.sin(2 * np.pi * 997 * n / 44100)
           + 0.02 * rng.standard_normal(t))
    sig[t // 2: t // 2 + 300] += 0.5 * rng.standard_normal(300)
    sig[100:140] += 0.6 * rng.standard_normal(40)
    return np.clip(np.stack([sig, 0.7 * sig]), -1, 1).astype(np.float32)


def test_chunked_equals_whole():
    pcm = _pcm(23)
    whole = encode_track(pcm, chunk_frames=0)
    chunked = encode_track(pcm, chunk_frames=7)
    _assert_planes_equal(whole, chunked)


def test_chunked_equals_whole_fixed_windows():
    pcm = _pcm(13, seed=3)[:1]
    whole = encode_track(pcm, chunk_frames=0, window_mode="fixed",
                         window_mask=5)
    chunked = encode_track(pcm, chunk_frames=4, window_mode="fixed",
                           window_mask=5)
    _assert_planes_equal(whole, chunked)
