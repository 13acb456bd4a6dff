"""Pallas fused quant-cost kernel vs the XLA formulation.

Runs the kernel in interpreter mode on CPU (the same kernel compiles on
TPU); the two plain-cost producers must agree exactly on integer outputs
and to reduction-order tolerance on the float energy ratios, and the full
quant_tensors memo (EA overlay on top) must track the same equivalence.
"""
import numpy as np
import jax.numpy as jnp

from atracdenc_tpu.models.atrac3 import bitalloc
from atracdenc_tpu.models.atrac3.encoder import _GATHER_MASK


def _inputs(seed=0, n=6):
    rng = np.random.default_rng(seed)
    scaled = (0.999 * np.tanh(rng.standard_normal((n, 32, 128)))
              ).astype(np.float32)
    # zero out invalid lanes like the real pipeline does
    return jnp.asarray(scaled * np.asarray(_GATHER_MASK))


def test_plain_costs_match():
    scaled = _inputs()
    err_x, vlc_x, pair_x = bitalloc._plain_costs_xla(scaled, _GATHER_MASK)
    err_p, vlc_p, pair_p = bitalloc._plain_costs_pallas(scaled, _GATHER_MASK)
    assert np.array_equal(np.asarray(vlc_x), np.asarray(vlc_p))
    assert np.array_equal(np.asarray(pair_x), np.asarray(pair_p))
    ex, ep = np.asarray(err_x), np.asarray(err_p)
    # lane 0: XLA leaves NaN (sanitized later in quant_tensors); Pallas
    # emits the sanitized 0 directly
    assert np.all(ep[..., 0] == 0.0)
    fmax = np.finfo(np.float32).max
    ex = np.where(np.isnan(ex), 0.0, np.where(np.isinf(ex), fmax, ex))
    np.testing.assert_allclose(ex[..., 1:], ep[..., 1:], rtol=1e-6)


def test_quant_tensors_equivalent():
    """use_pallas=True now runs the COMPLETE memo (plain + EA overlay +
    wl==1 pair codebook) inside one kernel (quant_cost_full); it must
    match the XLA quant_tensors exactly on the integer planes."""
    scaled = _inputs(seed=1, n=4)
    qt_x = bitalloc.quant_tensors(scaled, _GATHER_MASK, use_pallas=False)
    qt_p = bitalloc.quant_tensors(scaled, _GATHER_MASK, use_pallas=True)
    assert np.array_equal(np.asarray(qt_x["clc"]), np.asarray(qt_p["clc"]))
    assert np.array_equal(np.asarray(qt_x["vlc"]), np.asarray(qt_p["vlc"]))
    ex, ep = np.asarray(qt_x["err"]), np.asarray(qt_p["err"])
    np.testing.assert_allclose(ex, ep, rtol=1e-6)


def test_quant_tensors_edge_inputs():
    """Silent blocks (0/0 -> NaN -> 0 sanitize), all-tiny blocks (e2 == 0
    at mul > 0 -> inf -> FLT_MAX), and values pinned to the |delta| < 0.25
    EA candidate boundary must agree exactly between the paths."""
    rng = np.random.default_rng(3)
    x = np.zeros((5, 32, 128), np.float32)
    # row 0: silence; row 1: tiny values that quantize to all-zero
    x[1] = 1e-6
    # row 2: exact half-integer multiples of 1/maxq (rounding boundary)
    x[2] = (np.round(rng.uniform(-15, 15, (32, 128))) + 0.5) / 15.5
    # row 3: candidates straddling the 0.25 delta boundary at wl 2 (2.5)
    x[3] = (np.round(rng.uniform(-2, 2, (32, 128)))
            + rng.choice([0.249, 0.25, 0.251, 0.75], (32, 128))) / 2.5
    # row 4: dense random
    x[4] = 0.999 * np.tanh(rng.standard_normal((32, 128)))
    x = np.clip(x, -0.9999, 0.9999)
    scaled = jnp.asarray(x * np.asarray(_GATHER_MASK))

    qt_x = bitalloc.quant_tensors(scaled, _GATHER_MASK, use_pallas=False)
    qt_p = bitalloc.quant_tensors(scaled, _GATHER_MASK, use_pallas=True)
    assert np.array_equal(np.asarray(qt_x["vlc"]), np.asarray(qt_p["vlc"]))
    ex, ep = np.asarray(qt_x["err"]), np.asarray(qt_p["err"])
    assert np.isfinite(ep).all()
    np.testing.assert_allclose(ex, ep, rtol=1e-6)


def test_quant_tensors_full_under_vmap():
    """The batch transcoder vmaps the encoder over streams — the fused
    memo kernel must batch through jax.vmap with identical results."""
    import jax

    scaled = _inputs(seed=2, n=6).reshape(2, 3, 32, 128)
    qt_x = bitalloc.quant_tensors(scaled, _GATHER_MASK, use_pallas=False)
    qt_p = jax.vmap(lambda s: bitalloc.quant_tensors(
        s, _GATHER_MASK, use_pallas=True))(scaled)
    assert np.array_equal(np.asarray(qt_x["vlc"]), np.asarray(qt_p["vlc"]))
    np.testing.assert_allclose(np.asarray(qt_x["err"]),
                               np.asarray(qt_p["err"]), rtol=1e-6)
