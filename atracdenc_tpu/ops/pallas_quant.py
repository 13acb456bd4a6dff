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

Two kernels: `quant_cost_plain` (the 8 plain-rounded lanes) and
`quant_cost_full` (plain lanes + the greedy energy-adjusted overlay of
ops/quant.quant_blocks + the wl==1 pair codebook — the COMPLETE
bitalloc.quant_tensors memo in one VMEM residency; the greedy pass runs
as an in-kernel min-extraction while_loop with the same candidate order
and float op order as the XLA rank/scan formulation).

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
    errs, vlcs = [], []
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
        errs.append(err)

        # VLC single-symbol cost of the plain-rounded mantissas
        # (bitalloc._vlc_bits_arith as static step functions)
        mi = mant.astype(jnp.int32)
        idx = jnp.where(mi < 0, (-mi) * 2, jnp.where(mi > 0, mi * 2 - 1, 0))
        base, steps = _vlc_steps(min(max(w - 1, 0), 6))
        bits = jnp.full(idx.shape, base, jnp.int32)
        for j, d in steps:
            bits = bits + d * (idx >= j).astype(jnp.int32)
        vlcs.append(jnp.sum(jnp.where(valid, bits, 0), axis=-1))
    err_ref[...] = jnp.stack(errs, axis=-1)
    vlc_ref[...] = jnp.stack(vlcs, axis=-1)


def _vlc_bits_of_mant(mant, valid, sel):
    """VLC bit length of each (integer) mantissa under codebook `sel`,
    masked — bitalloc._vlc_bits_arith as static step functions."""
    idx = jnp.where(mant < 0, (-mant) * 2,
                    jnp.where(mant > 0, mant * 2 - 1, 0))
    base, steps = _vlc_steps(sel)
    bits = jnp.full(idx.shape, base, jnp.int32)
    for j, d in steps:
        bits = bits + d * (idx >= j).astype(jnp.int32)
    return jnp.where(valid, bits, 0)


def _ea_group(x, valid, e1, err, vlc, mant1, b, e, L, maxq):
    """Energy-adjusted refinement for BFUs [b, e) with block length L —
    the in-kernel equivalent of the XLA overlay in bitalloc.quant_tensors
    (ops/quant.quant_blocks semantics, candidate order = ascending
    |delta| with index tie-break, e2 updated as (e2 - a) + b in f32).

    x [R, 32, 128] scaled values; err/vlc are per-wordlen LISTS of [R, 32]
    lanes (Mosaic cannot lower minor-axis scatter, so lanes stay separate
    Python values until the final stack); mant1 [R, 32, 128] gets the
    wl==1 EA mantissas.  Returns (err, vlc, mant1).
    """
    nb = e - b
    # Full 128-lane width throughout: lane-padding the [.., :L] slice back
    # to 128 is a tpu.concatenate with mismatched sublane offsets, which
    # Mosaic cannot lower.  `valid` already encodes each BFU's block length
    # L, so lanes >= L are masked everywhere; only the two tree-sensitive
    # energy sums below slice to [..., :L] so the float reduction tree is
    # exactly ops.quant._round_energy's L-wide sum.
    sub = x[:, b:e, :]                               # [R, nb, 128]
    # slice THEN expand: [None, b:e] mixed indexing routes through jax's
    # internal_gather, which Mosaic cannot lower
    subv = valid[b:e][None]
    e1g = jnp.sum(jnp.where(subv, sub * sub, 0.0)[..., :L],
                  axis=-1)                           # [R, nb]
    del e1

    for w in range(1, _MAX_WL):
        mul = float(maxq[w])
        t = sub * mul
        m_old = jnp.where(subv, jnp.round(t), 0.0).astype(jnp.int32)
        inv2 = 1.0 / (mul * mul)
        e2g = jnp.sum(jnp.where(subv, (m_old * m_old).astype(sub.dtype),
                                0.0)[..., :L], axis=-1) * inv2
        up = e2g < e1g
        dn = e2g > e1g

        abs_t = jnp.abs(t)
        abs_m = jnp.abs(m_old).astype(sub.dtype)
        m_up = jnp.where(m_old > 0, m_old + 1,
                         jnp.where(m_old < 0, m_old - 1,
                                   jnp.where(t > 0, 1, -1)))
        m_dn = jnp.where(m_old > 0, m_old - 1,
                         jnp.where(m_old < 0, m_old + 1, m_old))
        m_new = jnp.where(up.astype(jnp.int32)[..., None] > 0, m_up, m_dn)
        elig_up = (abs_m < abs_t) & (abs_m < (mul - 1.0))
        elig_dn = abs_m > abs_t
        # int32, not bool: i1 vectors captured into (or carried through)
        # Mosaic while regions materialize as i8 and the i8->i1 trunci
        # has no legalization; minor-dim inserts ([..., None]) of i1 also
        # have no lowering — expand in int32, compare back
        up3 = up.astype(jnp.int32)[..., None] > 0
        dn3 = dn.astype(jnp.int32)[..., None] > 0
        elig = ((up3 & elig_up) | (~up3 & dn3 & elig_dn)).astype(jnp.int32)

        delta = t - (jnp.trunc(t) + 0.5)
        cand = subv & (jnp.abs(delta) < 0.25)
        key0 = jnp.where(cand, jnp.abs(delta), jnp.inf)

        a_term = (m_old * m_old).astype(sub.dtype) * inv2
        b_term = (m_new * m_new).astype(sub.dtype) * inv2
        if w >= 2:
            sel = min(w - 1, 6)
            dbits = (_vlc_bits_of_mant(m_new, True, sel)
                     - _vlc_bits_of_mant(m_old, True, sel))
        else:
            dbits = jnp.zeros(m_old.shape, jnp.int32)

        iota_l = jax.lax.broadcasted_iota(jnp.int32, sub.shape, 2)

        def step(state):
            _s, key, e2, accept, aux = state
            m = jnp.min(key, axis=-1, keepdims=True)
            is_min = key == m
            # first min position via iota (cumsum has no Mosaic lowering)
            first = iota_l == jnp.min(jnp.where(is_min, iota_l, 128),
                                      axis=-1, keepdims=True)
            real = m < jnp.inf
            a_s = jnp.sum(jnp.where(first, a_term, 0.0), axis=-1,
                          keepdims=True)
            b_s = jnp.sum(jnp.where(first, b_term, 0.0), axis=-1,
                          keepdims=True)
            el_s = jnp.any(first & (elig > 0), axis=-1, keepdims=True)
            d_s = jnp.sum(jnp.where(first, dbits, 0), axis=-1,
                          keepdims=True)
            ex = (e2 - a_s) + b_s
            e1k = e1g[..., None]
            acc = real & el_s & (jnp.abs(ex - e1k) < jnp.abs(e2 - e1k))
            e2 = jnp.where(acc, ex, e2)
            # int32 carry (i1 vector while-carries fail Mosaic legalization)
            accept = accept | (first & acc).astype(jnp.int32)
            aux = aux + jnp.where(acc, d_s, 0)[..., 0]
            key = jnp.where(first, jnp.inf, key)
            return _s + 1, key, e2, accept, aux

        # any candidate left and step budget remains
        def cond2(state):
            _s, key, *_ = state
            return (_s < L) & jnp.any(key < jnp.inf)

        init = (jnp.asarray(0, jnp.int32), key0, e2g[..., None],
                jnp.zeros(m_old.shape, jnp.int32),
                jnp.zeros(e2g.shape, jnp.int32))
        _, _, e2f, accept, aux = jax.lax.while_loop(cond2, step, init)
        accept = accept > 0
        e2f = e2f[..., 0]

        err_lane = e1g / e2f
        err_lane = jnp.where(jnp.isnan(err_lane), 0.0,
                             jnp.where(jnp.isinf(err_lane),
                                       jnp.finfo(jnp.float32).max,
                                       err_lane))
        # merge the [R, nb] lanes back into the 32-BFU tensors as static
        # per-column broadcast selects: sublane-offset pads/concats (both
        # jnp.pad and scatter forms) have no Mosaic lowering
        iota_b = jax.lax.broadcasted_iota(jnp.int32, err[w].shape, 1)
        for i in range(nb):
            err[w] = jnp.where(iota_b == b + i, err_lane[:, i:i + 1], err[w])
        if w == 1:
            m_adj = jnp.where(accept, m_new, m_old)
            m_adj = jnp.where(subv, m_adj, 0)
            iota_b3 = jax.lax.broadcasted_iota(jnp.int32, mant1.shape, 1)
            for i in range(nb):
                mant1 = jnp.where(iota_b3 == b + i,
                                  m_adj[:, i:i + 1, :], mant1)
        else:
            for i in range(nb):
                vlc[w] = vlc[w] + jnp.where(iota_b == b + i,
                                            aux[:, i:i + 1], 0)
    return err, vlc, mant1


def _full_kernel(x_ref, mask_ref, err_ref, vlc_ref, *, maxq, ea_groups):
    """Complete quant-cost memo: plain lanes + EA refinement + wl==1 pair
    codebook, one HBM read of the scaled blocks."""
    x = x_ref[...]                                   # [R, 32, 128]
    valid2 = mask_ref[...] > 0                       # [32, 128]
    valid = valid2[None]
    e1 = jnp.sum(jnp.where(valid, x * x, 0.0), axis=-1)   # [R, 32]

    err = []                 # per-wordlen [R, 32] lanes (stacked at the end)
    vlc = []
    mant1 = jnp.zeros(x.shape, jnp.int32)
    for w in range(_MAX_WL):
        mul = float(maxq[w])
        t = x * mul
        mant = jnp.where(valid, jnp.round(t), 0.0)
        if mul > 0:
            e2 = jnp.sum(jnp.where(valid, mant * mant, 0.0), axis=-1) * (
                1.0 / (mul * mul))
            lane = e1 / e2
            lane = jnp.where(jnp.isnan(lane), 0.0,
                             jnp.where(jnp.isinf(lane),
                                       jnp.finfo(jnp.float32).max, lane))
        else:
            lane = jnp.zeros_like(e1)
        err.append(lane)
        mi = mant.astype(jnp.int32)
        if w == 1:
            mant1 = mi
        bits = _vlc_bits_of_mant(mi, valid, min(max(w - 1, 0), 6))
        vlc.append(jnp.sum(bits, axis=-1))

    for b, e, L in ea_groups:
        err, vlc, mant1 = _ea_group(x, valid2, e1, err, vlc, mant1,
                                    b, e, L, maxq)

    # wl==1 pair codebook over (even, odd) neighbors — roll avoids any
    # minor-dim reshape (pairs start at even positions)
    nxt = pltpu.roll(mant1, 127, axis=mant1.ndim - 1)  # == jnp.roll(-1)
    keyp = 3 * (mant1 + 1) + (nxt + 1)
    iota128 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    even_valid = valid & (iota128 % 2 == 0)
    bits_pair = jnp.zeros(keyp.shape, jnp.int32)
    for k in range(9):
        blen = int(T.VLC_BITS[0, T.VLC_PAIR_RTAB[k]])
        bits_pair = bits_pair + blen * (keyp == k).astype(jnp.int32)
    vlc[1] = jnp.sum(jnp.where(even_valid, bits_pair, 0), axis=-1)

    err_ref[...] = jnp.stack(err, axis=-1)
    vlc_ref[...] = jnp.stack(vlc, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_cost_full(scaled, valid_mask, interpret=False):
    """scaled [..., 32, 128] f32, valid_mask [32, 128] -> (err, vlc)
    each [..., 32, 8].  COMPLETE: identical to
    bitalloc.quant_tensors(...)['err'/'vlc'] — plain costs, the EA
    overlay, and the wl==1 pair codebook all run in one VMEM-resident
    kernel."""
    lead = scaled.shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    x = scaled.reshape(n, 32, 128)
    rows = _ROWS
    pad = (-n) % rows
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, 32, 128), x.dtype)], axis=0)
    grid = (x.shape[0] // rows,)

    from atracdenc_tpu.models.atrac3.bitalloc import _ea_groups
    mask = jnp.asarray(valid_mask, jnp.int32)
    kernel = functools.partial(_full_kernel, maxq=np.asarray(T.MAX_QUANT),
                               ea_groups=tuple(_ea_groups()))

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


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_cost_plain(scaled, valid_mask=None, interpret=False):
    """scaled [..., 32, 128] f32, valid_mask [32, 128] (default: the BFU
    gather mask) -> (err [..., 32, 8] f32, vlc [..., 32, 8] i32):
    plain-rounding costs for all 8 wordlens.

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

    if valid_mask is None:
        from atracdenc_tpu.models.atrac3.encoder import _GATHER_MASK
        valid_mask = np.asarray(_GATHER_MASK) > 0
    mask = jnp.asarray(valid_mask).astype(jnp.int32)
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
