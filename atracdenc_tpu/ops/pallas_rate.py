"""Pallas TPU kernel: the full ATRAC3 rate-control loop, frame-minor.

Second-generation replacement for ops/pallas_alloc.bisect_block.  Two
structural fixes over that kernel, worth ~20x on a v5e:

  * **Frame-minor layout.**  The old kernel blocked channel-frames on the
    sublane axis ([256 rows, 32] / [256, 32, 8]), so the 8-wide wordlen
    axis landed on the 128-wide lane dimension — 15/16 of every vector
    register idle.  Here every tensor is transposed once in HBM to put the
    channel-frame block on the LANE axis ([32, N] / [32, 8, N]), so each
    op processes 128 frames per register at full density.
  * **The BFU-shrink loop runs in-kernel.**  The reference restarts the
    whole bisection when the last allocated BFU is zero
    (CheckBfus -> EStatus::Repeat, src/atrac/at3/atrac3_bitstream.cpp:
    229-239); the XLA path hoists that into a `lax.while_loop` around the
    kernel, relaunching it (and re-reading the cost memo from HBM) every
    round.  Here the while sits inside the kernel over VMEM-resident state.

Exactness contract (pinned by tests/test_pallas_alloc.py): every float op
mirrors models/atrac3/bitalloc.py op-for-op — the lambda arithmetic, the
trunc allocation (CalcBitsAllocation, atrac3_bitstream.cpp:343-407), the
6-step masked ConsiderEnergyErr fixed point, the CLC/VLC cost sums, and
the 32-step tonal subgroup walk (EncodeTonalComponents dry-run,
atrac3_bitstream.cpp:453-595).  The only transcendental (log2 of the
gain-energy scale) is precomputed outside, in csfi.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atracdenc_tpu.models.atrac3 import tables as T
from atracdenc_tpu.models.atrac3.tonal import TONAL_BFU_FIRST, TONAL_BFU_LAST

_MAX_WL = 8
_LANES = 256           # channel-frames per grid step (lane axis); 512
                        # lanes overflow the 16 MiB scoped-VMEM stack on
                        # v5e (measured 18.75M, 2026-08-19)
_BISECT_STEPS = 11
_MAX_BLOCKS = TONAL_BFU_LAST - TONAL_BFU_FIRST
                       # <= 21 tonal blocks exist: one run per BFU in
                       # [TONAL_BFU_FIRST, TONAL_BFU_LAST), and regrouping
                       # never increases the count (ceil(5k/7) <= k); slots
                       # >= _MAX_BLOCKS are always inactive (guarded at the
                       # rate_control_block entry)
assert _MAX_BLOCKS <= 32
# limiter break ranks within one (bucket, pos>>6) cluster: the 7-member
# limiter re-opens a subgroup at every 8th member (cnt = 1 + 7k); only
# ranks <= _MAX_BLOCKS can occur
_BRK_RANKS = tuple(range(8, _MAX_BLOCKS + 1, 7))


def _eval_alloc(shift, *, csfi, gated, tcounts, spread, num_bfu, err,
                clc, vlc, t_active, t_pos, t_len, t_bfu, t_vlc,
                fix, xdiv, iota32, iota8):
    """One allocation evaluation at lambda `shift` [1, N].

    All per-BFU tensors are [32, N]; the cost memo is [32, 8, N]; scalars
    per channel-frame are [1, N].  Returns (wl [32, N] i32, bits [1, N]).
    """
    in_use = iota32 < num_bfu                          # [32, N]
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
        oh = (iota8 == wl[:, None, :]).astype(jnp.float32)   # [32, 8, N]
        err_sel = jnp.sum(err * oh, axis=1)                  # [32, N]
        e = jnp.where(wl > 0, err_sel, 0.0)
        cond = (((e > 0) & (e < 0.7)) | (e > 1.2)) & (wl < 7) & boostable
        wl = jnp.where(cond, wl + 1, wl)

    # CalcSpecsBitsConsumption
    in_use2 = in_use & (wl > 0)
    ohw = (iota8 == wl[:, None, :]).astype(jnp.int32)
    clc_sel = jnp.sum(clc * ohw, axis=1)
    vlc_sel = jnp.sum(vlc * ohw, axis=1)
    clc_sum = jnp.sum(jnp.where(in_use2, clc_sel, 0), axis=0, keepdims=True)
    vlc_sum = jnp.sum(jnp.where(in_use2, vlc_sel, 0), axis=0, keepdims=True)
    mode = clc_sum <= vlc_sum
    bits = (3 * num_bfu
            + 6 * jnp.sum(in_use2.astype(jnp.int32), axis=0, keepdims=True)
            + jnp.where(mode, clc_sum, vlc_sum))

    # --- tonal section dry-run: closed form (mirror of
    # tonal.make_cost_fn; the sequential bucket automaton collapses to
    # pairwise predicates because positions ascend within every bucket
    # stream — see that docstring for the derivation).  The j-loop
    # accumulates each earlier block's contribution to all later rows,
    # entirely in registers/VMEM.
    active2 = (t_active > 0) & (t_bfu < num_bfu)       # [32, N]
    # wl at each block's first-component BFU (static one-hot accumulation)
    wl_b = jnp.zeros_like(t_bfu)
    for k in range(32):
        wl_b = wl_b + wl[k:k + 1, :] * (t_bfu == k).astype(jnp.int32)
    quant = jnp.clip(jnp.where(active2, wl_b + 4, 0), 2, 7)
    quant = jnp.where(active2, quant, 0)

    vlc_at_q = jnp.zeros_like(quant)
    for qq in range(2, 8):
        vlc_at_q = vlc_at_q + jnp.where(quant == qq, t_vlc[:, qq, :], 0)
    member_bits = jnp.where(active2, 12 + vlc_at_q, 0)
    base = jnp.sum(member_bits, axis=0, keepdims=True)

    grp = t_pos >> 6                                   # 64-line anchor group
    win = t_pos >> 8                                   # QMF window index
    act_i = active2.astype(jnp.int32)

    def pair_body(j, carry):
        # block j's contribution to every later row i > j (a fori_loop
        # keeps the per-iteration temporaries off the scoped-VMEM stack;
        # the unrolled form blew the 16 MiB limit at 256 lanes)
        any_sb, any_sw, cnt = carry
        # Mosaic has no dynamic_slice on values: one-hot row extraction
        is_j = iota32 == j
        row = lambda x: jnp.sum(jnp.where(is_j, x, 0), axis=0, keepdims=True)
        same_b = ((row(act_i) > 0) & (iota32 > j)
                  & (t_len == row(t_len))
                  & (quant == row(quant)))
        any_sb = any_sb | same_b.astype(jnp.int32)
        cnt = cnt + (same_b & (grp == row(grp))).astype(jnp.int32)
        any_sw = any_sw | (same_b & (win == row(win))).astype(jnp.int32)
        return any_sb, any_sw, cnt

    any_sb, any_sw, cnt = jax.lax.fori_loop(
        0, _MAX_BLOCKS - 1, pair_body,
        (jnp.zeros_like(quant), jnp.zeros_like(quant), act_i))
    first = active2 & (any_sb == 0)
    # limiter break at cluster ranks 1+7k (cnt <= _MAX_BLOCKS; explicit
    # compares sidestep Mosaic's i32 rem)
    brk_hit = jnp.zeros_like(cnt) > 0
    for r in _BRK_RANKS:
        brk_hit = brk_hit | (cnt == r)
    brk = active2 & brk_hit
    new_sub = first | brk
    new_win = active2 & (new_sub | (any_sw == 0))

    ns = new_sub.astype(jnp.int32)
    nw = new_win.astype(jnp.int32)
    tcsgn = jnp.sum(ns, axis=0, keepdims=True)
    sub_bits = jnp.sum(ns * 10 + nw * 12, axis=0, keepdims=True)
    tbits = 5 + jnp.where(tcsgn > 0, 2 + sub_bits + base, 0)

    return wl, bits + tbits, mode


def _run_bisection(ev, target, n):
    """λ-bisection (±0.01 shrink, keep the last under-budget λ —
    bs_encode/encode.cpp:57-98), all-[1, N] state."""
    def step(_, carry):
        min_l, max_l, last_l = carry
        active = max_l > min_l
        cur = (max_l + min_l) * 0.5
        _, bits, _ = ev(cur)
        under = bits < target
        over = bits > target
        exact = ~under & ~over
        last_l = jnp.where(active & (under | exact), cur, last_l)
        max_l = jnp.where(active & under, cur - 0.01, max_l)
        min_l = jnp.where(active & over, cur + 0.01, min_l)
        max_l = jnp.where(active & exact, min_l, max_l)
        return min_l, max_l, last_l

    init = (jnp.full((1, n), -8.0, jnp.float32),
            jnp.full((1, n), 20.0, jnp.float32),
            jnp.full((1, n), 20.0, jnp.float32))
    _, _, last_l = jax.lax.fori_loop(0, _BISECT_STEPS, step, init)
    return last_l


def _kernel(csfi_ref, gated_ref, tcounts_ref, spread_ref, target_ref,
            nbfu_ref, err_ref, clc_ref, vlc_ref, ta_ref, tp_ref, tl_ref,
            tb_ref, tv_ref, constf_ref, wl_ref, nbfu_out_ref, mode_ref,
            *, auto):
    n = csfi_ref.shape[-1]
    fix = constf_ref[0:32, 0:1]                        # [32, 1]
    xdiv = constf_ref[32:64, 0:1]
    iota32 = jax.lax.broadcasted_iota(jnp.int32, (32, n), 0)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (32, _MAX_WL, n), 1)

    ev_fixed = functools.partial(
        _eval_alloc,
        csfi=csfi_ref[...], gated=gated_ref[...] > 0,
        tcounts=tcounts_ref[...], spread=spread_ref[...],
        err=err_ref[...], clc=clc_ref[...], vlc=vlc_ref[...],
        t_active=ta_ref[...], t_pos=tp_ref[...], t_len=tl_ref[...],
        t_bfu=tb_ref[...], t_vlc=tv_ref[...],
        fix=fix, xdiv=xdiv, iota32=iota32, iota8=iota8)
    target = target_ref[...]

    def one_round(num_bfu):
        ev = functools.partial(ev_fixed, num_bfu=num_bfu)
        last_l = _run_bisection(ev, target, n)
        wl, _, mode = ev(last_l)
        # wl at index num_bfu-1 (one-hot over the BFU axis)
        last = jnp.sum(jnp.where(iota32 == num_bfu - 1, wl, 0),
                       axis=0, keepdims=True)
        shrink = (last == 0) & (num_bfu > 1)
        if not auto:
            shrink = shrink & False
        # int32 carries only: Mosaic cannot legalize i1 vectors in
        # scf.while yields
        return wl, mode.astype(jnp.int32), shrink

    num_bfu = nbfu_ref[...]
    wl, mode, shrink = one_round(num_bfu)
    num_bfu = jnp.where(shrink, num_bfu - 1, num_bfu)

    if auto:
        def cond(state):
            return state[0] > 0

        def body(state):
            _, num_bfu, wl, mode = state
            wl, mode, shrink = one_round(num_bfu)
            num_bfu = jnp.where(shrink, num_bfu - 1, num_bfu)
            return (jnp.any(shrink).astype(jnp.int32), num_bfu, wl, mode)

        _, num_bfu, wl, mode = jax.lax.while_loop(
            cond, body,
            (jnp.any(shrink).astype(jnp.int32), num_bfu, wl, mode))

    wl_ref[...] = wl
    nbfu_out_ref[...] = num_bfu
    mode_ref[...] = mode


@functools.partial(jax.jit, static_argnames=("auto", "interpret"))
def rate_control_block(csfi, gated, tonal_counts, spread, target, num_bfu,
                       err, clc, vlc, t_active, t_pos, t_len, t_bfu, t_vlc,
                       auto=True, interpret=False):
    """Full ATRAC3 rate control for a batch of channel-frames.

    csfi [..., 32] f32, gated [..., 32] bool, tonal_counts [..., 32] i32,
    spread/target/num_bfu [...], err [..., 32, 8] f32, clc/vlc [..., 32, 8]
    i32, tonal planes t_* ([..., 32] / t_vlc [..., 32, 8]).
    auto=False freezes num_bfu (the --bfuidxconst path).
    Returns (num_bfu [...], mode [...] bool, wl [..., 32]) — identical to
    models/atrac3/bitalloc.allocate's result.
    """
    lead = spread.shape
    n = int(np.prod(lead)) if lead else 1
    lanes = _LANES
    pad = (-n) % lanes
    total = n + pad

    def prep2(x, dtype):
        """[..., 32] -> [32, total] (frame-minor)."""
        x = x.reshape((n, 32)).astype(dtype)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, 32), dtype)], axis=0)
        return x.T

    def prep1(x, dtype, fill=0):
        x = x.reshape((n,)).astype(dtype)
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,), fill, dtype)], axis=0)
        return x[None, :]

    def prep3(x, dtype):
        """[..., 32, 8] -> [32, 8, total]."""
        x = x.reshape((n, 32, _MAX_WL)).astype(dtype)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, 32, _MAX_WL), dtype)], axis=0)
        return jnp.transpose(x, (1, 2, 0))

    csfi = prep2(csfi, jnp.float32)
    gated = prep2(gated, jnp.int32)
    tonal_counts = prep2(tonal_counts, jnp.int32)
    spread = prep1(spread, jnp.float32)
    target = prep1(target, jnp.int32, fill=1)
    num_bfu = prep1(num_bfu, jnp.int32, fill=1)
    err = prep3(err, jnp.float32)
    clc = prep3(clc, jnp.int32)
    vlc = prep3(vlc, jnp.int32)
    t_active = prep2(t_active, jnp.int32)
    t_pos = prep2(t_pos, jnp.int32)
    t_len = prep2(t_len, jnp.int32)
    t_bfu = prep2(t_bfu, jnp.int32)
    t_vlc = prep3(t_vlc, jnp.int32)
    constf = jnp.concatenate(
        [jnp.asarray(T.FIXED_BIT_ALLOC, jnp.float32),
         jnp.asarray(T.SFI_DIVISOR, jnp.float32)])[:, None]   # [64, 1]

    grid = (total // lanes,)
    c2 = pl.BlockSpec((32, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    c1 = pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    c3 = pl.BlockSpec((32, _MAX_WL, lanes), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)

    wl, nbfu, mode = pl.pallas_call(
        functools.partial(_kernel, auto=auto),
        grid=grid,
        in_specs=[c2, c2, c2, c1, c1, c1, c3, c3, c3,
                  c2, c2, c2, c2, c3,
                  pl.BlockSpec((64, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(c2, c1, c1),
        out_shape=(jax.ShapeDtypeStruct((32, total), jnp.int32),
                   jax.ShapeDtypeStruct((1, total), jnp.int32),
                   jax.ShapeDtypeStruct((1, total), jnp.int32)),
        interpret=interpret,
    )(csfi, gated, tonal_counts, spread, target, num_bfu, err, clc, vlc,
      t_active, t_pos, t_len, t_bfu, t_vlc, constf)

    wl = wl.T[:n].reshape(lead + (32,))
    nbfu = nbfu[0, :n].reshape(lead)
    mode = mode[0, :n].reshape(lead) > 0
    return nbfu, mode, wl
