"""Psychoacoustic-common property tests (fast tier), mirroring
atrac3denc_ut's window-identity check and the TrackLoudness IIR contract
(reference: atrac3denc_ut.cpp window identity; atrac_psy_common.h:46-54).
"""
import numpy as np
import jax.numpy as jnp

from atracdenc_tpu.models.atrac3 import tables as T
from atracdenc_tpu.ops import psy


def test_at3_window_identity():
    """DecodeWindow = 2*EncodeWindow / (EncodeWindow^2 + reversed^2) makes
    analysis x synthesis windows TDAC-complementary: hs*hd + hs'*hd' == 2
    at every lap position (the reference asserts EncodeWindow/2 ==
    hs/(hs^2+hs'^2))."""
    he = np.asarray(T.ENCODE_WINDOW, np.float64)
    hd = np.asarray(T.DECODE_WINDOW, np.float64)
    np.testing.assert_allclose(hd, 2.0 * he / (he ** 2 + he[::-1] ** 2),
                               rtol=1e-6)
    np.testing.assert_allclose(he * hd + he[::-1] * hd[::-1],
                               2.0, rtol=1e-6)


def test_track_loudness_iir_converges_and_holds():
    f = 400
    l0 = jnp.full((f,), 3.0, jnp.float32)
    l1 = jnp.full((f,), 5.0, jnp.float32)
    # stereo: L = 0.98 L + 0.01 (l0 + l1) -> fixed point (l0+l1)/2 = 4
    out = np.asarray(psy.track_loudness_scan(
        l0, l1, jnp.ones((f,), bool), jnp.zeros((f,), bool),
        jnp.float32(0.0)))
    assert abs(out[-1] - 4.0) < 1e-2
    assert np.all(np.diff(out) >= -1e-6)       # monotone rise from 0
    # mono: fixed point = l0
    out1 = np.asarray(psy.track_loudness_scan(
        l0, jnp.zeros((f,)), jnp.zeros((f,), bool), jnp.ones((f,), bool),
        jnp.float32(0.0)))
    assert abs(out1[-1] - 3.0) < 1e-2
    # transient frames (neither flag) hold the carry unchanged
    hold = np.asarray(psy.track_loudness_scan(
        l0, l1, jnp.zeros((f,), bool), jnp.zeros((f,), bool),
        jnp.float32(2.5)))
    assert np.all(hold == np.float32(2.5))


def test_track_loudness_matches_sequential_reference():
    rng = np.random.default_rng(0)
    f = 64
    l0 = rng.uniform(0, 10, f).astype(np.float32)
    l1 = rng.uniform(0, 10, f).astype(np.float32)
    both = rng.random(f) < 0.5
    one = ~both & (rng.random(f) < 0.5)
    out = np.asarray(psy.track_loudness_scan(
        jnp.asarray(l0), jnp.asarray(l1), jnp.asarray(both),
        jnp.asarray(one), jnp.float32(1.0)))
    ref = np.empty(f, np.float32)
    state = np.float32(1.0)
    for i in range(f):
        if both[i]:
            state = np.float32(np.float32(0.98) * state
                               + np.float32(0.01) * (l0[i] + l1[i]))
        elif one[i]:
            state = np.float32(np.float32(0.98) * state
                               + np.float32(0.02) * l0[i])
        ref[i] = state
    np.testing.assert_allclose(out, ref, rtol=1e-6)
