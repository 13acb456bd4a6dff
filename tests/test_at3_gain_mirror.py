"""Algebraic gain-compensation mirror tests (fast tier).

The reference pins ~15 scenarios in test/ut/atrac3denc_ut.cpp:96-1160:
Modulate -> Mdct -> Midct -> Demodulate must reconstruct the input
amplitude for gain curves of 0/1/2 points at assorted locations and
levels.  Our analogs are mdct_frames (gain division + windowed MDCT with
the cross-frame first-level scale of gain_processor.h:97-105) and
imdct_frames (IMDCT + overlap-add + demodulation).  These property tests
guard the gain algebra itself — independent of the golden byte suites, so
a future optimization pass that breaks the Modulate/Demodulate mirror
fails fast on CPU.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from atracdenc_tpu.models.atrac3.mdct import (first_level_scale,
                                              gain_divisors, imdct_frames,
                                              mdct_frames)

F = 6          # frames
# The mirror is algebraically exact; float error scales with the PEAK
# INTERMEDIATE of the modulated MDCT buffer (input/div, further amplified
# by the cross-frame 1/scale of gain_processor.h:97-105) — measured ~1 ulp
# of that peak.  atol = max(floor, 2 ulp of peak): a broken mirror errs at
# O(peak), three orders above.
EPS_FLOOR = 1e-3
ULP = 1.2e-7


def _curves(gain_pts):
    """gain_pts: list (per frame) of list (per band) of [(lev, loc), ...]
    -> (div [1, F, 4, 256], scale [1, F, 4]) jnp arrays."""
    lev = np.zeros((1, F, 4, 8), np.int32)
    loc = np.zeros((1, F, 4, 8), np.int32)
    npt = np.zeros((1, F, 4), np.int32)
    for f, bands in enumerate(gain_pts):
        for b, pts in enumerate(bands):
            npt[0, f, b] = len(pts)
            for p, (l, x) in enumerate(pts):
                lev[0, f, b, p] = l
                loc[0, f, b, p] = x
    div = gain_divisors(jnp.asarray(lev), jnp.asarray(loc), jnp.asarray(npt))
    scale = first_level_scale(jnp.asarray(lev), jnp.asarray(npt))
    return div, scale


def _roundtrip(bands, gain_pts):
    div, scale = _curves(gain_pts)
    specs = mdct_frames(jnp.asarray(bands), div=div, scale=scale)
    out = np.asarray(imdct_frames(specs, div=div, scale=scale))
    cur_peak = float(np.abs(np.asarray(bands) / np.asarray(div)).max())
    s = np.asarray(scale)
    # scale < 1 amplifies the stored half on the encode side (prev/scale);
    # scale > 1 amplifies the decoded head's roundtrip error (head*scale)
    amp = max(1.0 / min(1.0, float(s.min())), max(1.0, float(s.max())))
    atol = max(EPS_FLOOR, 2 * ULP * cur_peak * amp)
    # out[f] reconstructs input frame f-1; compare interior frames
    return out[:, 2:F, :, :], bands[:, 1:F - 1, :, :], atol


def _assert_mirror(gain_pts, signal="dc"):
    rng = np.random.default_rng(0)
    t = np.arange(256)
    if signal == "dc":
        x = np.full(256, 0.5, np.float32)
    elif signal == "sine":
        x = (0.5 * np.sin(2 * np.pi * 17.0 * t / 256)).astype(np.float32)
    else:
        x = (0.4 * rng.standard_normal(256)).astype(np.float32)
    bands = np.broadcast_to(x, (1, F, 4, 256)).astype(np.float32).copy()
    got, want, atol = _roundtrip(bands, gain_pts)
    np.testing.assert_allclose(got, want, atol=atol)


def _pts(per_frame_band):
    """Same points for every frame and band."""
    return [[per_frame_band] * 4 for _ in range(F)]


def test_no_gain_points_dc():
    _assert_mirror(_pts([]))


def test_no_gain_points_sine():
    _assert_mirror(_pts([]), "sine")


@pytest.mark.parametrize("loc", [0, 1, 8, 16, 24, 31])
def test_one_point_locations_dc(loc):
    _assert_mirror(_pts([(1, loc)]))


@pytest.mark.parametrize("lev", [0, 2, 6, 10, 15])
def test_one_point_levels_dc(lev):
    _assert_mirror(_pts([(lev, 10)]))


def test_one_point_sine():
    _assert_mirror(_pts([(2, 5)]), "sine")


@pytest.mark.parametrize("pts", [
    [(1, 2), (4, 20)],
    [(0, 0), (15, 31)],
    [(6, 7), (5, 8)],
    [(3, 1), (3, 30)],
])
def test_two_points_dc(pts):
    _assert_mirror(_pts(pts))


def test_varying_curves_across_frames_and_bands_noise():
    """Different curve per frame AND per band — the cross-frame
    first-level-scale coupling (gain_processor.h:97-105) must still
    cancel exactly through the OLA boundary."""
    rng = np.random.default_rng(5)
    gain_pts = []
    for _ in range(F):
        bands = []
        for _ in range(4):
            n = int(rng.integers(0, 4))
            locs = np.sort(rng.choice(32, n, replace=False))
            bands.append([(int(rng.integers(0, 16)), int(l)) for l in locs])
        gain_pts.append(bands)
    _assert_mirror(gain_pts, "noise")


def test_transient_amplitude_step():
    """Reference scenario shape: a 4x amplitude step inside the frame with
    a matching gain point — reconstruction must hold despite the step."""
    x = np.full(256, 0.2, np.float32)
    x[128:] = 0.8
    bands = np.broadcast_to(x, (1, F, 4, 256)).astype(np.float32).copy()
    got, want, atol = _roundtrip(bands, _pts([(2, 16)]))
    np.testing.assert_allclose(got, want, atol=atol)
