"""Stage-level wall-clock profile of the ATRAC3 default-mode batch.

Times each pipeline stage as its own jitted function (same inputs as
bench.py) so the ms budget in PERF.md is measured, not guessed.  Run on
the real chip:  python tools/profile_at3.py [--streams 32] [--frames 256]
Optionally dumps an xplane trace with --trace DIR.
"""
import argparse
import time

import numpy as np


def timeit(fn, *args, iters=8, warmup=2):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=32)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--no-tonal", action="store_true")
    ap.add_argument("--no-gain", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from atracdenc_tpu.models.atrac3 import tables as T
    from atracdenc_tpu.models.atrac3 import encoder as E
    from atracdenc_tpu.models.atrac3 import tonal, gain
    from atracdenc_tpu.models.atrac3.mdct import (mdct_frames, gain_divisors,
                                                  first_level_scale)
    from atracdenc_tpu.models.atrac3.bitalloc import quant_tensors, allocate
    from atracdenc_tpu.models.atrac3.device_pack import pack_device_batch
    from atracdenc_tpu.ops import psy, scale as scale_ops

    S, F = args.streams, args.frames
    t = 1024 * F
    rng = np.random.default_rng(42)
    n = np.arange(t, dtype=np.float64)
    base = 0.4 * np.sin(2 * np.pi * 997.0 * n / 44100.0)
    pcm = np.clip(base[None, None, :] * np.asarray([1.0, 0.8])[None, :, None]
                  + 0.05 * rng.standard_normal((S, 2, t)), -1, 1
                  ).astype(np.float32)
    x = jnp.asarray(pcm)
    no_tonal, no_gain = args.no_tonal, args.no_gain

    # ---- full pipeline ----
    full = jax.jit(lambda xs: pack_device_batch(
        jax.vmap(lambda p: E.encode_frames(
            p, frame_bytes=384, js=False,
            no_gain_control=no_gain, no_tonal=no_tonal))(xs), 384, False))
    t_full = timeit(full, x)
    fps = S * F / t_full
    print(f"full pipeline          {t_full*1e3:8.1f} ms   "
          f"{fps:9.0f} frames/s  ({fps/1046.0:.1f}x ref)")

    # ---- stages ----
    vm = partial(jax.vmap)

    @jax.jit
    def stage_bands(xs):
        return jax.vmap(E.band_frames)(xs)
    bands = stage_bands(x)
    print(f"qmf analysis           {timeit(stage_bands, x)*1e3:8.1f} ms")

    state = jax.vmap(E.init_state, axis_size=S, out_axes=0)(
    ) if False else None
    # replicate init state across streams
    st1 = E.init_state(2)
    st = jax.tree.map(lambda a: jnp.broadcast_to(a, (S,) + a.shape), st1)
    nh = jnp.zeros((S, 2, 4, 128), jnp.float32)

    if not no_gain:
        @jax.jit
        def stage_gain(bands, st, nh):
            return jax.vmap(lambda b, g, n_: gain.gain_control(
                b, ctx=g, next_head=n_))(bands, st["gain"], nh)
        glv, glc, gnp_, gctx = stage_gain(bands, st, nh)
        print(f"gain_control           "
              f"{timeit(stage_gain, bands, st, nh)*1e3:8.1f} ms")

        @jax.jit
        def stage_div(glv, glc, gnp_):
            return jax.vmap(gain_divisors)(glv, glc, gnp_), \
                   jax.vmap(first_level_scale)(glv, gnp_)
        div, scl = stage_div(glv, glc, gnp_)
        print(f"gain_divisors          "
              f"{timeit(stage_div, glv, glc, gnp_)*1e3:8.1f} ms")

        @jax.jit
        def stage_es(bands, div, scl, st):
            return jax.vmap(lambda b, d, s, p, o: gain.energy_scale(
                b, d, s, prev_half=p, prev_overlap_init=o))(
                bands, div, scl, st["mdct_prev"], st["next_overlap"])
        gs, es_carry = stage_es(bands, div, scl, st)
        print(f"energy_scale           "
              f"{timeit(stage_es, bands, div, scl, st)*1e3:8.1f} ms")

        @jax.jit
        def stage_mdct(bands, div, scl, st):
            return jax.vmap(lambda b, d, s, p: mdct_frames(
                b, d, s, prev_half=p))(bands, div, scl, st["mdct_prev"])
        specs = stage_mdct(bands, div, scl, st)
        print(f"mdct(gain)             "
              f"{timeit(stage_mdct, bands, div, scl, st)*1e3:8.1f} ms")
    else:
        gs = jnp.ones((S, 2, F, 4), jnp.float32)

        @jax.jit
        def stage_mdct(bands, st):
            return jax.vmap(lambda b, p: mdct_frames(b, prev_half=p))(
                bands, st["mdct_prev"])
        specs = stage_mdct(bands, st)
        print(f"mdct                   "
              f"{timeit(stage_mdct, bands, st)*1e3:8.1f} ms")

    if not no_tonal:
        @jax.jit
        def stage_tonal(specs):
            flat = jax.vmap(tonal.flatness_per_bfu)(specs * specs)
            sp2, tp = jax.vmap(tonal.extract)(specs, flat)
            return sp2, jax.vmap(tonal.scale_groups)(tp)
        specs2, tplanes = stage_tonal(specs)
        print(f"tonal extract+groups   "
              f"{timeit(stage_tonal, specs)*1e3:8.1f} ms")
        specs = specs2

    @jax.jit
    def stage_scale(specs):
        blocks = jax.vmap(E.gather_bfu_blocks)(specs)
        return scale_ops.scale_blocks(blocks, E._GATHER_MASK, E._SCALE_TABLE)
    sfi, scaled, energy = stage_scale(specs)
    print(f"scale_blocks           {timeit(stage_scale, specs)*1e3:8.1f} ms")

    @jax.jit
    def stage_quant(scaled):
        return quant_tensors(scaled, E._GATHER_MASK)
    qt = stage_quant(scaled)
    print(f"quant_tensors          {timeit(stage_quant, scaled)*1e3:8.1f} ms")

    spread = jax.jit(E.spread_from_sfi)(sfi)
    target = jnp.full((S, 2, F), 1400, jnp.int32)
    loud = jnp.full((S, 2, F), 1.0, jnp.float32)

    @jax.jit
    def stage_alloc(qt, sfi, gs, energy, spread, loud, target):
        return allocate(qt, sfi, gs, energy, spread, loud, target)
    nb, mode, wl = stage_alloc(qt, sfi, gs, energy, spread, loud, target)
    print(f"allocate               "
          f"{timeit(stage_alloc, qt, sfi, gs, energy, spread, loud, target)*1e3:8.1f} ms")

    planes = jax.jit(lambda xs: jax.vmap(lambda p: E.encode_frames(
        p, frame_bytes=384, js=False, no_gain_control=no_gain,
        no_tonal=no_tonal))(xs))(x)

    @jax.jit
    def stage_pack(planes):
        return pack_device_batch(planes, 384, False)
    _ = stage_pack(planes)
    print(f"device_pack            {timeit(stage_pack, planes)*1e3:8.1f} ms")

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(full(x))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
