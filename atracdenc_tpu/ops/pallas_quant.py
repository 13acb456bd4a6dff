"""Pallas TPU kernel: fused per-(BFU, wordlen) quantization costing.

The ATRAC3 rate-control memo (bitalloc.quant_tensors, the TPU analog of the
reference TEncCache, src/atrac/atrac_enc_cache.cpp) evaluates, for every
BFU block and every candidate wordlen 0..7: the quantized-energy ratio
e1/e2 and the VLC spectrum bit cost.  The XLA formulation broadcasts the
[N, 32, 128] scaled blocks to 8 wordlen lanes ([N, 32, 8, 128]) before
reducing; this kernel instead reads each 128-float block into VMEM ONCE and
produces all 8 lanes' costs in-register — 8x less HBM traffic on the
largest tensor of the encode pipeline.

Numerically this mirrors ops.quant._round_energy / bitalloc._vlc_bits_arith
op-for-op (multiply, round-half-even, masked sums, step-function codebook
lengths); the only tolerated difference is the 128-lane reduction tree,
which jnp.sum also leaves to the backend in the XLA path.

Enable via bitalloc.quant_tensors(..., use_pallas=True) or the
ATRACDENC_TPU_PALLAS=1 environment variable; tests/test_pallas_quant.py
pins equality against the XLA path.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atracdenc_tpu.models.atrac3 import tables as T

_MAX_WL = 8
_ROWS = 8          # channel-frames per grid step


def _vlc_steps(sel):
    """Static (threshold, delta) list for codebook `sel` bit lengths."""
    lens = T.VLC_BITS[sel]
    steps = []
    prev = int(lens[0])
    for j in range(1, 63):
        if lens[j] == 0:
            break
        d = int(lens[j]) - prev
        if d:
            steps.append((j, d))
        prev = int(lens[j])
    return int(lens[0]), steps


def _kernel(x_ref, mask_ref, err_ref, vlc_ref, *, maxq):
    x = x_ref[...]                                   # [R, 32, 128] f32
    valid = mask_ref[...][None] > 0                  # [1, 32, 128] bool
    e1 = jnp.sum(jnp.where(valid, x * x, 0.0), axis=-1)   # [R, 32]
    for w in range(_MAX_WL):
        mul = float(maxq[w])
        t = x * mul
        mant = jnp.round(t)
        mant = jnp.where(valid, mant, 0.0)
        m2 = mant * mant
        if mul > 0:
            e2 = jnp.sum(jnp.where(valid, m2, 0.0), axis=-1) * (
                1.0 / (mul * mul))
            err = e1 / e2
            # select-safe sanitization, exactly as the memo's
            # (bitalloc.quant_tensors): NaN -> 0, inf -> FLT_MAX
            err = jnp.where(jnp.isnan(err), 0.0,
                            jnp.where(jnp.isinf(err),
                                      jnp.finfo(jnp.float32).max, err))
        else:
            err = jnp.zeros_like(e1)                 # wl==0: never boosted
        err_ref[..., w] = err

        # VLC single-symbol cost of the plain-rounded mantissas
        # (bitalloc._vlc_bits_arith as static step functions)
        mi = mant.astype(jnp.int32)
        idx = jnp.where(mi < 0, (-mi) * 2, jnp.where(mi > 0, mi * 2 - 1, 0))
        base, steps = _vlc_steps(min(max(w - 1, 0), 6))
        bits = jnp.full(idx.shape, base, jnp.int32)
        for j, d in steps:
            bits = bits + d * (idx >= j).astype(jnp.int32)
        vlc_ref[..., w] = jnp.sum(jnp.where(valid, bits, 0), axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_cost_plain(scaled, interpret=False):
    """scaled [..., 32, 128] f32 -> (err [..., 32, 8] f32,
    vlc [..., 32, 8] i32): plain-rounding costs for all 8 wordlens.

    The EA refinement region and the wl==1 pair codebook are layered on top
    by bitalloc.quant_tensors exactly as in the XLA path.
    """
    lead = scaled.shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    x = scaled.reshape(n, 32, 128)
    rows = _ROWS
    pad = (-n) % rows
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, 32, 128), x.dtype)], axis=0)
    grid = (x.shape[0] // rows,)

    from atracdenc_tpu.models.atrac3.encoder import _GATHER_MASK
    mask = jnp.asarray(np.asarray(_GATHER_MASK) > 0, jnp.int32)
    kernel = functools.partial(_kernel, maxq=np.asarray(T.MAX_QUANT))

    err, vlc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 32, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, 32, _MAX_WL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 32, _MAX_WL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], 32, _MAX_WL), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], 32, _MAX_WL), jnp.int32),
        ),
        interpret=interpret,
    )(x, mask)
    if pad:
        err = err[:n]
        vlc = vlc[:n]
    return err.reshape(lead + (32, _MAX_WL)), \
        vlc.reshape(lead + (32, _MAX_WL))
