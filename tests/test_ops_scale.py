"""Scaler property tests (fast tier), mirroring atrac_scale_ut.cpp:
lower_bound SFI selection, scaled-value bound, clip behavior at |x| >= 1,
and energy bookkeeping (reference: src/atrac/atrac_scale.cpp:141-188).
"""
import numpy as np
import jax.numpy as jnp

from atracdenc_tpu.ops import scale as scale_ops
from atracdenc_tpu.models.atrac3 import tables as T


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((6, 32, 128)).astype(np.float32) * 0.3
    x[0] *= 0           # silence
    x[1, 5, 3] = 1.7    # over-range -> clamp + clip
    x[2] *= 1e-6        # tiny
    mask = np.asarray(T.GATHER_MASK, bool)
    return x * mask, mask


def test_sfi_is_lower_bound():
    x, mask = _inputs()
    table = np.asarray(T.SCALE_TABLE, np.float64)
    sfi, scaled, energy = scale_ops.scale_blocks(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(T.SCALE_TABLE))
    sfi = np.asarray(sfi)
    maxabs = np.minimum(np.abs(x).max(-1), 1.0)
    # C++ lower_bound: first element NOT less than maxabs
    expect = np.searchsorted(np.asarray(T.SCALE_TABLE), maxabs, "left")
    assert np.array_equal(sfi, expect)
    # chosen scale factor bounds the block
    sf = table[sfi]
    assert np.all(maxabs <= sf + 1e-12)


def test_scaled_values_bounded_and_energy():
    x, mask = _inputs(1)
    sfi, scaled, energy = scale_ops.scale_blocks(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(T.SCALE_TABLE))
    scaled = np.asarray(scaled)
    assert np.abs(scaled).max() < 1.0        # clip at 0.99999
    np.testing.assert_allclose(
        np.asarray(energy), (x.astype(np.float64) ** 2 * mask).sum(-1)
        .astype(np.float32), rtol=1e-5)


def test_over_range_value_clips():
    x, mask = _inputs()
    sfi, scaled, _ = scale_ops.scale_blocks(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(T.SCALE_TABLE))
    # block with the 1.7 spike: maxabs clamps to 1.0 -> sfi points at the
    # first table entry >= 1.0 and the spike clips to 0.99999
    s = np.asarray(scaled)[1, 5, 3]
    assert abs(s) == np.float32(0.99999)
