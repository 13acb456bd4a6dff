"""Stage-level profiler for the ATRAC3+ encode pipeline (PERF.md evidence).

Times each pipeline stage as its own jitted function, plus the production
`run` path bench.py measures (core + host tail + device pack).

  python tools/profile_at3p.py [--streams 4] [--frames 128] [--iters 3]
"""
import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/atracdenc_tpu_jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from atracdenc_tpu.models.atrac3p import encoder as E
    from atracdenc_tpu.models.atrac3p import gha, pqf
    from atracdenc_tpu.models.atrac3p import tables as T
    from atracdenc_tpu.models.atrac3p.device_pack import pack_device
    from atracdenc_tpu.models.atrac3p.mdct import mdct_frames
    from atracdenc_tpu.ops import scale as scale_ops

    rng = np.random.default_rng(0)
    t = args.frames * T.NUM_SAMPLES
    n = np.arange(t)
    base = 0.3 * np.sin(2 * np.pi * 997 * n / 44100)
    pcm = np.stack([base + 0.05 * rng.standard_normal(t),
                    0.7 * base + 0.05 * rng.standard_normal(t)]
                   ).astype(np.float32)
    x = jnp.asarray(pcm)
    frames = args.frames
    print(f"one stream: 2 ch x {t} samples ({frames} frames); "
          f"{args.streams} streams for the production-path timing")

    def timeit(name, fn, *a):
        out = jax.block_until_ready(fn(*a))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*a))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{name:28s} {dt * 1e3:9.2f} ms   "
              f"{frames / dt:12.0f} frames/s-equiv")
        return out

    bands = timeit("pqf/bands", jax.jit(E.band_frames), x)
    tones = timeit("gha.extract", jax.jit(gha.extract), bands)
    resid = timeit("gha.subtract", jax.jit(gha.subtract), bands, tones)

    @jax.jit
    def st_mdct(resid):
        res = jnp.pad(resid[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        return mdct_frames(res * T.RESIDUAL_SCALE)

    specs = timeit("mdct", st_mdct, resid)

    @jax.jit
    def st_scale(specs):
        blocks = E.gather_qu_blocks(specs)
        return scale_ops.scale_blocks(blocks, E._GATHER_MASK, E._SCALE_TABLE)

    sfi, scaled, _ = timeit("scale", st_scale, specs)

    @jax.jit
    def st_mant_cost(scaled):
        inv_mant = jnp.asarray(T.INV_MANT_TAB)[jnp.asarray(T.FIXED_WORDLEN)]
        mant = jnp.round(scaled * inv_mant[:, None]).astype(jnp.int32)
        mant = jnp.where(E._GATHER_MASK, mant, 0)
        costs = []
        for qu in range(32):
            wl = int(T.FIXED_WORDLEN[qu])
            qc = [E._qu_table_cost(mant[..., qu, :], qu, 7 * i + wl - 1)
                  for i in range(8)]
            costs.append(jnp.stack(qc, axis=-1))
        cost = jnp.stack(costs, axis=-2)
        return mant, cost

    timeit("mant+vlc_cost", st_mant_cost, scaled)

    core = jax.jit(lambda p: E._encode_core(p, gha_mask=7))
    timeit("core fused (gha on)", core, x)
    core_off = jax.jit(lambda p: E._encode_core(p, gha_mask=None))
    timeit("core fused (gha off)", core_off, x)

    # host tail + pack: the production path bench.py times
    def run(p):
        c = E._encode_core(p, gha_mask=7)
        planes = E._finish_planes(c, 2)
        jp = {k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
                  else jnp.asarray(v)) for k, v in planes.items()}
        return jax.device_get(pack_device(jp, 2))

    run(x)
    t0 = time.perf_counter()
    run(x)
    dt = time.perf_counter() - t0
    print(f"{'run() 1 stream e2e':28s} {dt * 1e3:9.2f} ms   "
          f"{frames / dt:12.0f} frames/s")

    # host-tail cost alone
    c = jax.block_until_ready(core(x))
    t0 = time.perf_counter()
    planes = E._finish_planes(c, 2)
    dt = time.perf_counter() - t0
    print(f"{'_finish_planes host tail':28s} {dt * 1e3:9.2f} ms")

    jp = {k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
              else jnp.asarray(v)) for k, v in planes.items()}
    timeit("pack_device", lambda p: pack_device(p, 2), jp)


if __name__ == "__main__":
    main()
