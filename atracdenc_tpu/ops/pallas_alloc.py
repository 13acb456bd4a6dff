"""Pallas TPU kernel: the ENTIRE ATRAC3 rate-control loop, VMEM-resident.

The reference converges each channel-frame's bit budget with a lambda
bisection (src/lib/bs_encode/encode.cpp:57-98) whose every step runs
CalcBitsAllocation + the ConsiderEnergyErr wordlen-boost fixed point +
CalcSpecsBitsConsumption + an EncodeTonalComponents dry-run
(src/atrac/at3/atrac3_bitstream.cpp:272-336,453-595).  The XLA formulation
(bitalloc._bisect) launches each of those as separate HBM-roundtrip ops
~12x per frame batch; this kernel runs the full 11-step bisection, the
boost fixed point, the spec-bit costing AND the tonal subgroup walk for a
block of channel-frames entirely in VMEM — one HBM read of the per-frame
cost memo, one write of the final wordlens.

Exactness: every float op (lambda arithmetic, trunc allocation, err
comparisons) is the same IEEE f32 elementwise op in the same order as the
XLA path; integer bit sums are order-independent.  The only transcendental
(log2 of the gain-energy scale) is precomputed OUTSIDE the kernel so
Mosaic's libm cannot diverge from XLA's.  tests/test_pallas_alloc.py pins
bit-equality of the final wordlens against bitalloc.allocate.

Enable via bitalloc.allocate(..., use_pallas=True) or
ATRACDENC_TPU_PALLAS=1 (same switch as the quant-cost kernel).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atracdenc_tpu.models.atrac1 import tables as T1
from atracdenc_tpu.models.atrac3 import tables as T

_MAX_WL = 8
_ROWS = 256            # channel-frames per grid step
_BISECT_STEPS = 11
_NBUCKETS = 64         # (quantizer, len) tonal buckets


def _eval_alloc(shift, *, csfi, gated, tcounts, spread, num_bfu, err,
                clc, vlc, t_active, t_pos, t_len, t_bfu, t_vlc,
                fix, xdiv, iota32, iota8, bids):
    """One allocation evaluation at lambda `shift` [R, 1].

    Returns (wl [R, 32] i32, bits [R, 1] i32) — allocation after the
    tonal discount and energy boost, plus spec + tonal section bits.
    Mirrors bitalloc.calc_bits_allocation/_energy_boost/_spec_cost and
    tonal.make_cost_fn op-for-op.
    """
    in_use = iota32 < num_bfu
    tmp = jnp.trunc(spread * (csfi / xdiv) + (1.0 - spread) * fix - shift)
    wl = jnp.where(tmp > 7, 7.0,
                   jnp.where(tmp < 0, 0.0,
                             jnp.where(tmp == 0, 1.0, tmp))).astype(jnp.int32)
    wl = jnp.where(gated | ~in_use, 0, wl)

    # tonal-BFU discount (atrac3_bitstream.cpp:396-404); max 3 effective
    for i in range(3):
        wl = jnp.where(in_use & (tcounts > i) & (wl > 2), wl - 1, wl)

    # ConsiderEnergyErr fixed point: each lane bumps independently, so 6
    # masked iterations == the XLA while_loop (wl starts >= 1 when
    # boostable; at most 6 bumps reach the cap of 7)
    boostable = iota32 < jnp.minimum(T.BOOST_NAQ_END, num_bfu)
    for _ in range(6):
        oh = (iota8 == wl[..., None]).astype(jnp.float32)
        err_sel = jnp.sum(err * oh, axis=-1)
        e = jnp.where(wl > 0, err_sel, 0.0)
        cond = (((e > 0) & (e < 0.7)) | (e > 1.2)) & (wl < 7) & boostable
        wl = jnp.where(cond, wl + 1, wl)

    # CalcSpecsBitsConsumption
    in_use2 = in_use & (wl > 0)
    ohw = (iota8 == wl[..., None]).astype(jnp.int32)
    clc_sel = jnp.sum(clc * ohw, axis=-1)
    vlc_sel = jnp.sum(vlc * ohw, axis=-1)
    clc_sum = jnp.sum(jnp.where(in_use2, clc_sel, 0), axis=-1, keepdims=True)
    vlc_sum = jnp.sum(jnp.where(in_use2, vlc_sel, 0), axis=-1, keepdims=True)
    mode = clc_sum <= vlc_sum
    bits = (3 * num_bfu
            + 6 * jnp.sum(in_use2.astype(jnp.int32), axis=-1, keepdims=True)
            + jnp.where(mode, clc_sum, vlc_sum))

    # --- tonal section dry-run (tonal.make_cost_fn) ---
    active2 = (t_active > 0) & (t_bfu < num_bfu)
    # wl at each block's first-component BFU (static one-hot accumulation;
    # Mosaic-friendly: no gathers)
    wl_b = jnp.zeros_like(t_bfu)
    for k in range(32):
        wl_b = wl_b + wl[:, k:k + 1] * (t_bfu == k).astype(jnp.int32)
    quant = jnp.clip(jnp.where(active2, wl_b + 4, 0), 2, 7)
    quant = jnp.where(active2, quant, 0)
    bucket = jnp.where(active2, quant * 8 + t_len, 0)

    vlc_at_q = jnp.zeros_like(quant)
    for qq in range(2, 8):
        vlc_at_q = vlc_at_q + jnp.where(quant == qq, t_vlc[..., qq], 0)
    member_bits = jnp.where(active2, 12 + vlc_at_q, 0)
    base = jnp.sum(member_bits, axis=-1, keepdims=True)

    rows = bucket.shape[0]
    anchor = jnp.zeros((rows, _NBUCKETS), jnp.int32)
    limiter = jnp.zeros((rows, _NBUCKETS), jnp.int32)
    prev_win = jnp.full((rows, _NBUCKETS), -1, jnp.int32)
    started = jnp.zeros((rows, _NBUCKETS), jnp.bool_)
    nsub = jnp.zeros((rows, _NBUCKETS), jnp.int32)
    nwin = jnp.zeros((rows, _NBUCKETS), jnp.int32)
    for g in range(32):
        m_active = active2[:, g:g + 1]
        m_bucket = bucket[:, g:g + 1]
        m_pos = t_pos[:, g:g + 1]
        here = m_active & (bids == m_bucket)
        first = here & ~started
        inwin = (m_pos - (anchor & ~63)) < 64
        lim2 = jnp.where(inwin, limiter + 1, 0)
        anchor2 = jnp.where(inwin, anchor, m_pos)
        brk = here & started & (lim2 >= 7)
        new_sub = first | brk
        anchor3 = jnp.where(new_sub, m_pos, anchor2)
        lim3 = jnp.where(new_sub, 0, lim2)
        win = m_pos >> 8
        new_win = here & (new_sub | (win != prev_win))
        anchor = jnp.where(here, anchor3, anchor)
        limiter = jnp.where(here, lim3, limiter)
        prev_win = jnp.where(here, win, prev_win)
        started = started | here
        nsub = nsub + new_sub.astype(jnp.int32)
        nwin = nwin + new_win.astype(jnp.int32)
    tcsgn = jnp.sum(nsub, axis=-1, keepdims=True)
    sub_bits = jnp.sum(nsub * 10 + nwin * 12, axis=-1, keepdims=True)
    tbits = 5 + jnp.where(tcsgn > 0, 2 + sub_bits + base, 0)

    return wl, bits + tbits


def _kernel(csfi_ref, gated_ref, tcounts_ref, spread_ref, target_ref,
            nbfu_ref, err_ref, clc_ref, vlc_ref, ta_ref, tp_ref, tl_ref,
            tb_ref, tv_ref, const_ref, wl_ref):
    rows = csfi_ref.shape[0]
    fix = const_ref[0:1, :]
    xdiv = const_ref[1:2, :]
    iota32 = jax.lax.broadcasted_iota(jnp.int32, (rows, 32), 1)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (rows, 32, _MAX_WL), 2)
    bids = jax.lax.broadcasted_iota(jnp.int32, (rows, _NBUCKETS), 1)

    ev = functools.partial(
        _eval_alloc,
        csfi=csfi_ref[...], gated=gated_ref[...] > 0,
        tcounts=tcounts_ref[...], spread=spread_ref[...],
        num_bfu=nbfu_ref[...], err=err_ref[...], clc=clc_ref[...],
        vlc=vlc_ref[...], t_active=ta_ref[...], t_pos=tp_ref[...],
        t_len=tl_ref[...], t_bfu=tb_ref[...], t_vlc=tv_ref[...],
        fix=fix, xdiv=xdiv, iota32=iota32, iota8=iota8, bids=bids)
    target = target_ref[...]

    last_l = _run_bisection(ev, target, lo=-8.0, hi=20.0, rows=rows)
    wl, _ = ev(last_l)
    wl_ref[...] = wl


def _run_bisection(ev, target, *, lo, hi, rows):
    """The λ-bisection both kernels share (±0.01 shrink, keep the last
    under-budget λ, exact-hit interval collapse — bs_encode/encode.cpp:
    57-98, pinned bit-equal to bitalloc._bisect by tests/test_pallas_*).
    `ev(λ) -> (wl, bits)`; returns the final λ per row."""
    def step(_, carry):
        min_l, max_l, last_l = carry
        active = max_l > min_l
        cur = (max_l + min_l) * 0.5
        _, bits = ev(cur)
        under = bits < target
        over = bits > target
        exact = ~under & ~over
        last_l = jnp.where(active & (under | exact), cur, last_l)
        max_l = jnp.where(active & under, cur - 0.01, max_l)
        min_l = jnp.where(active & over, cur + 0.01, min_l)
        max_l = jnp.where(active & exact, min_l, max_l)
        return min_l, max_l, last_l

    init = (jnp.full((rows, 1), lo, jnp.float32),
            jnp.full((rows, 1), hi, jnp.float32),
            jnp.full((rows, 1), hi, jnp.float32))
    _, _, last_l = jax.lax.fori_loop(0, _BISECT_STEPS, step, init)
    return last_l


def _at1_eval(shift, *, sfi_f, fix, bias, gated, in_use, specs):
    """ATRAC1 CalcBitsAllocation at lambda `shift` (models/atrac1/
    bitalloc.calc_bits_allocation, op-for-op) + bits used.

    gated/in_use arrive as int32 masks: this runs inside fori/while
    regions, and captured i1 vectors fail Mosaic legalization (i8->i1
    trunci) — compare at use instead."""
    spread = T1.BIT_ALLOC_SPREAD
    tmp = jnp.trunc(spread * (sfi_f / 3.2) + (1.0 - spread) * fix
                    - shift + bias)
    wl = jnp.where(tmp > 16, 16.0,
                   jnp.where(tmp < 2, 0.0, tmp)).astype(jnp.int32)
    live = (gated == 0) & (in_use > 0)
    wl = jnp.where(live, wl, 0)
    bits = jnp.sum(jnp.where(in_use > 0, specs * wl, 0), axis=-1,
                   keepdims=True)
    return wl, bits


def _at1_bisect(target, *, sfi_f, fix, bias, gated, in_use, specs, rows):
    ev = functools.partial(_at1_eval, sfi_f=sfi_f, fix=fix, bias=bias,
                           gated=gated, in_use=in_use, specs=specs)
    last_l = _run_bisection(ev, target, lo=-3.0, hi=15.0, rows=rows)
    wl, _ = ev(last_l)
    return wl


def _at1_kernel(sfi_ref, energy_ref, short_ref, loud_ref, cf_ref, ci_ref,
                idx_ref, wl_ref, *, auto, start_idx, boost_entries,
                boost_min_key, boost_max_per_it, bfu_amount, shrink_rounds):
    rows = sfi_ref.shape[0]
    n52 = sfi_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, n52), 1)
    ath = cf_ref[0:1, :]
    fix_long = cf_ref[1:2, :]
    fix_short = cf_ref[2:3, :]
    band = ci_ref[0:1, :]
    specs = ci_ref[1:2, :]

    sfi = sfi_ref[...]
    sfi_f = sfi.astype(jnp.float32)
    energy = energy_ref[...]
    loud = loud_ref[...]

    # per-BFU short flag / fixed table (band is static {0,1,2}).
    # Selected in int32: a jnp.where whose VALUES are i1 vectors makes
    # Mosaic materialize them as i8 and emit an i8->i1 trunci that has
    # no legalization — select ints, compare at use.
    sf = (short_ref[...] > 0).astype(jnp.int32)      # [R, 3]
    short_i = jnp.where(band == 0, sf[:, 0:1],
                        jnp.where(band == 1, sf[:, 1:2], sf[:, 2:3]))
    short_b = short_i > 0
    fix = jnp.where(short_b, fix_short, fix_long)
    # int32 mask: captured into fori/while regions (see _at1_eval)
    gated = ((~short_b) & (energy < ath * loud)).astype(jnp.int32)

    def mk_inputs(bfu_num):
        """lambda-independent per-round inputs (tilt bias needs in_use);
        in_use returns int32 — it crosses Mosaic region boundaries."""
        in_use = iota < bfu_num
        is_low = (band == 0) & in_use
        is_mid = (band == 1) & in_use
        n_low = jnp.sum(is_low.astype(jnp.int32), axis=-1, keepdims=True)
        n_mid = jnp.sum(is_mid.astype(jnp.int32), axis=-1, keepdims=True)
        sum_low = jnp.sum(jnp.where(is_low, sfi, 0), axis=-1,
                          keepdims=True).astype(jnp.float32)
        sum_mid = jnp.sum(jnp.where(is_mid, sfi, 0), axis=-1,
                          keepdims=True).astype(jnp.float32)
        tilt = jnp.where(
            (n_low > 0) & (n_mid > 0),
            sum_low / jnp.maximum(n_low, 1) - sum_mid / jnp.maximum(n_mid, 1),
            0.0)
        mid_bias = jnp.minimum(
            T1.BAND_BIAS_MAX,
            T1.BAND_BIAS_GAIN
            * jnp.maximum(0.0, tilt - T1.BAND_BIAS_TILT_FLOOR))
        bias = jnp.where(band == 0, 0.0,
                         jnp.where(band == 1, mid_bias,
                                   mid_bias * T1.BAND_BIAS_HIGH_RATIO))
        target = (T1.SOUND_UNIT_SIZE * 8 - T1.BITS_PER_BFU_AMOUNT_TAB_IDX
                  - 32 - 2 - 3
                  - bfu_num * (T1.BITS_PER_IDWL + T1.BITS_PER_IDSF))
        return in_use.astype(jnp.int32), bias, target

    def amount(idx):
        out = jnp.zeros_like(idx)
        for k, v in enumerate(bfu_amount):
            out = out + jnp.where(idx == k, int(v), 0)
        return out

    bfu_idx = jnp.full((rows, 1), start_idx, jnp.int32)
    bfu_num = amount(bfu_idx)
    in_use, bias, target = mk_inputs(bfu_num)
    wl = _at1_bisect(target, sfi_f=sfi_f, fix=fix, bias=bias, gated=gated,
                     in_use=in_use, specs=specs, rows=rows)

    if auto:
        amount_tab = np.asarray(bfu_amount, np.int32)

        def round_body(state):
            r, bfu_idx, wl, _ = state
            bfu_num = amount(bfu_idx)
            last_nz = jnp.max(
                jnp.where((wl > 0) & (iota < bfu_num), iota, -1),
                axis=-1, keepdims=True)
            used_idx = jnp.zeros_like(bfu_idx)
            for v in amount_tab:
                used_idx = used_idx + (int(v) < (last_nz + 1)).astype(
                    jnp.int32)
            repeat = used_idx < bfu_idx
            new_idx = jnp.where(repeat, bfu_idx - 1, bfu_idx)
            in_use, bias, target = mk_inputs(amount(new_idx))
            new_wl = _at1_bisect(target, sfi_f=sfi_f, fix=fix, bias=bias,
                                 gated=gated, in_use=in_use, specs=specs,
                                 rows=rows)
            wl = jnp.where(repeat, new_wl, wl)
            # int32 carry: Mosaic cannot legalize i1 in scf.while yields
            return r + 1, new_idx, wl, jnp.any(repeat).astype(jnp.int32)

        def round_cond(state):
            r, _, _, again = state
            return (r < shrink_rounds - 1) & (again > 0)

        _, bfu_idx, wl, _ = jax.lax.while_loop(
            round_cond, round_body,
            (jnp.asarray(0, jnp.int32), bfu_idx, wl,
             jnp.asarray(1, jnp.int32)))

    # leftover-bit booster (models/atrac1/bitalloc._apply_boost)
    bfu_num = amount(bfu_idx)
    _, _, target = mk_inputs(bfu_num)
    surplus = (target - jnp.sum(jnp.where(iota < bfu_num, specs * wl, 0),
                                axis=-1, keepdims=True)).astype(jnp.int32)
    key = jnp.minimum(surplus, boost_max_per_it)
    # int32 mask: captured into the boost while region (see _at1_eval)
    enabled = (surplus >= boost_min_key).astype(jnp.int32)

    def one_pass(wl, surplus):
        changed = jnp.zeros((rows, 1), bool)
        for bits, pos in boost_entries:
            w = wl[:, pos:pos + 1]
            nbps = jnp.where(w > 0, 1, 2)
            ok = ((enabled > 0)
                  & (surplus >= boost_min_key)
                  & (bits <= key)
                  & (pos < bfu_num)
                  & (w != 16)
                  & ~((w == 0) & (bits * 2 > surplus))
                  & (bits * nbps <= surplus))
            inc = jnp.where(ok, nbps, 0)
            wl = jnp.where(iota == pos, wl + inc, wl)
            surplus = surplus - inc * bits
            changed = changed | ok
        return wl, surplus, changed

    def boost_cond(state):
        _, surplus, changed = state
        return jnp.any((changed > 0) & (surplus >= boost_min_key))

    def boost_body(state):
        wl, surplus, _ = state
        wl, surplus, changed = one_pass(wl, surplus)
        # int32 carry: Mosaic cannot legalize i1 vectors in while yields
        return wl, surplus, changed.astype(jnp.int32)

    wl, surplus, changed = one_pass(wl, surplus)
    wl, _, _ = jax.lax.while_loop(
        boost_cond, boost_body, (wl, surplus, changed.astype(jnp.int32)))

    idx_ref[...] = bfu_idx
    wl_ref[...] = wl


@functools.partial(jax.jit, static_argnames=("bfu_idx_const", "interpret"))
def at1_allocate_block(sfi, energy, short_flags, loudness, bfu_idx_const=0,
                       interpret=False):
    """Fused ATRAC1 rate control: bisection + BFU-shrink rounds + the
    leftover-bit booster walk, all VMEM-resident per channel-frame block.

    sfi [..., 52] i32, energy [..., 52] f32, short_flags [..., 3] bool,
    loudness [...] f32.  Returns (bfu_idx [...] i32, wl [..., 52] i32) —
    identical to models/atrac1/bitalloc.allocate.
    """
    from atracdenc_tpu.models.atrac1.bitalloc import (
        _at1_ath_long, _BOOST_ENTRIES, _BOOST_MIN_KEY, _BOOST_MAX_PER_IT,
        _SHRINK_ROUNDS)

    lead = loudness.shape
    n = int(np.prod(lead)) if lead else 1
    nb = T1.MAX_BFUS
    rows = _ROWS
    pad = (-n) % rows

    def prep(x, tail, dtype):
        x = x.reshape((n,) + tail).astype(dtype)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + tail, dtype)], axis=0)
        return x

    sfi = prep(sfi, (nb,), jnp.int32)
    energy = prep(energy, (nb,), jnp.float32)
    short_flags = prep(short_flags, (3,), jnp.int32)
    loudness = prep(loudness, (), jnp.float32)[:, None]
    consts_f = jnp.stack([
        jnp.asarray(_at1_ath_long(), jnp.float32),
        jnp.asarray(T1.FIXED_BIT_ALLOC_LONG, jnp.float32),
        jnp.asarray(T1.FIXED_BIT_ALLOC_SHORT, jnp.float32)])
    consts_i = jnp.stack([jnp.asarray(T1.BFU_TO_BAND, jnp.int32),
                          jnp.asarray(T1.SPECS_PER_BLOCK, jnp.int32)])

    auto = bfu_idx_const == 0
    kernel = functools.partial(
        _at1_kernel, auto=auto,
        start_idx=7 if auto else bfu_idx_const - 1,
        boost_entries=tuple(_BOOST_ENTRIES),
        boost_min_key=_BOOST_MIN_KEY,
        boost_max_per_it=_BOOST_MAX_PER_IT,
        bfu_amount=tuple(int(v) for v in np.asarray(T1.BFU_AMOUNT_TAB)),
        shrink_rounds=_SHRINK_ROUNDS)

    total = n + pad
    grid = (total // rows,)
    rb = lambda w: pl.BlockSpec((rows, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    bfu_idx, wl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[rb(nb), rb(nb), rb(3), rb(1),
                  pl.BlockSpec((3, nb), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, nb), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(rb(1), rb(nb)),
        out_shape=(jax.ShapeDtypeStruct((total, 1), jnp.int32),
                   jax.ShapeDtypeStruct((total, nb), jnp.int32)),
        interpret=interpret,
    )(sfi, energy, short_flags, loudness, consts_f, consts_i)
    if pad:
        bfu_idx = bfu_idx[:n]
        wl = wl[:n]
    return bfu_idx.reshape(lead), wl.reshape(lead + (nb,))


@functools.partial(jax.jit, static_argnames=("interpret",))
def bisect_block(csfi, gated, tonal_counts, spread, target, num_bfu,
                 err, clc, vlc, t_active, t_pos, t_len, t_bfu, t_vlc,
                 interpret=False):
    """One full lambda-bisection round for a batch of channel-frames.

    csfi [..., 32] f32 (clip(sfi + 1.5*log2(gs), 0, 63) — precomputed),
    gated [..., 32] bool (ATH x loudness gate), tonal_counts [..., 32] i32,
    spread [...] f32, target [...] i32, num_bfu [...] i32,
    err [..., 32, 8] f32, clc/vlc [..., 32, 8] i32,
    t_* tonal block planes ([..., 32] / t_vlc [..., 32, 8]).
    Returns wl [..., 32] i32 — identical to bitalloc._bisect's result.
    """
    lead = spread.shape
    n = int(np.prod(lead)) if lead else 1
    rows = _ROWS
    pad = (-n) % rows

    def prep(x, tail, dtype):
        x = x.reshape((n,) + tail).astype(dtype)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + tail, dtype)], axis=0)
        return x

    csfi = prep(csfi, (32,), jnp.float32)
    gated = prep(gated, (32,), jnp.int32)
    tonal_counts = prep(tonal_counts, (32,), jnp.int32)
    spread = prep(spread, (), jnp.float32)[:, None]
    target = prep(target, (), jnp.int32)[:, None]
    num_bfu = prep(num_bfu, (), jnp.int32)[:, None]
    err = prep(err, (32, _MAX_WL), jnp.float32)
    clc = prep(clc, (32, _MAX_WL), jnp.int32)
    vlc = prep(vlc, (32, _MAX_WL), jnp.int32)
    t_active = prep(t_active, (32,), jnp.int32)
    t_pos = prep(t_pos, (32,), jnp.int32)
    t_len = prep(t_len, (32,), jnp.int32)
    t_bfu = prep(t_bfu, (32,), jnp.int32)
    t_vlc = prep(t_vlc, (32, _MAX_WL), jnp.int32)
    consts = jnp.stack([jnp.asarray(T.FIXED_BIT_ALLOC, jnp.float32),
                        jnp.asarray(T.SFI_DIVISOR, jnp.float32)])

    total = n + pad
    grid = (total // rows,)
    r32 = lambda: pl.BlockSpec((rows, 32), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    r1 = lambda: pl.BlockSpec((rows, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    r328 = lambda: pl.BlockSpec((rows, 32, _MAX_WL), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

    wl = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[r32(), r32(), r32(), r1(), r1(), r1(),
                  r328(), r328(), r328(),
                  r32(), r32(), r32(), r32(), r328(),
                  pl.BlockSpec((2, 32), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=r32(),
        out_shape=jax.ShapeDtypeStruct((total, 32), jnp.int32),
        interpret=interpret,
    )(csfi, gated, tonal_counts, spread, target, num_bfu, err, clc, vlc,
      t_active, t_pos, t_len, t_bfu, t_vlc, consts)
    if pad:
        wl = wl[:n]
    return wl.reshape(lead + (32,))
