"""One-shot TPU perf campaign: XLA vs Pallas rate control x stream counts.

Runs the PERF.md measurement plan end to end and prints a JSON report:

  python tools/perf_campaign.py [--seconds 47.5] [--iters 4]
                                [--streams 16,32,64]

For each stream count it measures the full-mode ATRAC3 end-to-end
frames/s (encode + on-device serialization, steady-state with transfer
overlap) under both rate-control paths, plus the AT1 units/s under both
paths at the best AT3 configuration.  Intended to run ONCE on the real
chip; paste the table into PERF.md and set bench.py's default from the
winner.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

REF_AT3 = 1046.0
REF_AT1 = 11670.0


def rate(batched, x, n_items, iters):
    import jax
    out = jax.device_get(batched(x))
    pending = None
    t0 = time.perf_counter()
    for _ in range(iters):
        nxt = batched(x)
        if pending is not None:
            out = jax.device_get(pending)
        pending = nxt
    out = jax.device_get(pending)
    del out
    return n_items / ((time.perf_counter() - t0) / iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=47.5)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--streams", default="16,32,64")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from atracdenc_tpu.models.atrac3 import bitalloc as ba3
    from atracdenc_tpu.models.atrac1 import bitalloc as ba1

    t = int(args.seconds * 44100) // 1024 * 1024
    rng = np.random.default_rng(42)
    n = np.arange(t, dtype=np.float64)
    base = 0.4 * np.sin(2 * np.pi * 997.0 * n / 44100.0)
    stream_counts = [int(s) for s in args.streams.split(",")]
    smax = max(stream_counts)
    pcm_all = np.clip(
        base[None, None, :] * np.asarray([1.0, 0.8])[None, :, None]
        + 0.05 * rng.standard_normal((smax, 2, t)), -1, 1
    ).astype(np.float32)

    report = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0]), "at3": {}, "at1": {}}

    def at3_fn(use_pallas):
        from atracdenc_tpu.models.atrac3.encoder import encode_frames
        from atracdenc_tpu.models.atrac3.device_pack import pack_device_batch

        # flip the module default so the nested allocate/quant_tensors pick
        # it up; the flag is read at TRACE time, so drop cached executables
        ba3._PALLAS_DEFAULT = use_pallas
        jax.clear_caches()
        return jax.jit(lambda xs: pack_device_batch(
            jax.vmap(lambda p: encode_frames(
                p, frame_bytes=384, js=False,
                no_gain_control=False, no_tonal=False))(xs), 384, False))

    frames_per_stream = t // 1024
    for s in stream_counts:
        x = jnp.asarray(pcm_all[:s])
        for name, up in (("xla", False), ("pallas", True)):
            try:
                fps = rate(at3_fn(up), x, s * frames_per_stream, args.iters)
            except Exception as e:      # Mosaic lowering may fail: record it
                report["at3"][f"s{s}_{name}"] = f"ERROR: {e}"[:300]
                continue
            report["at3"][f"s{s}_{name}"] = {
                "frames_per_s": round(fps, 1),
                "vs_ref": round(fps / REF_AT3, 2)}
            print(f"at3 s={s} {name}: {fps:.0f} f/s ({fps/REF_AT3:.2f}x)",
                  flush=True)
    ba3._PALLAS_DEFAULT = False

    def at1_fn(use_pallas):
        from atracdenc_tpu.models.atrac1.encoder import encode_frames
        from atracdenc_tpu.models.atrac1.device_pack import pack_device

        ba1._PALLAS_DEFAULT = use_pallas
        jax.clear_caches()

        def one(p):
            planes = encode_frames(p)
            merged = {k: jnp.swapaxes(v, 0, 1).reshape((-1,) + v.shape[2:])
                      for k, v in planes.items()}
            return pack_device(merged)
        return jax.jit(lambda xs: jax.vmap(one)(xs))

    s1 = min(8, smax)
    t1 = 512 * 512
    x1 = jnp.asarray(pcm_all[:s1, :, :t1])
    units = s1 * 2 * (t1 // 512)
    for name, up in (("xla", False), ("pallas", True)):
        try:
            ups = rate(at1_fn(up), x1, units, args.iters)
        except Exception as e:
            report["at1"][name] = f"ERROR: {e}"[:300]
            continue
        report["at1"][name] = {"units_per_s": round(ups, 1),
                               "vs_ref": round(ups / REF_AT1, 2)}
        print(f"at1 {name}: {ups:.0f} units/s ({ups/REF_AT1:.2f}x)",
              flush=True)
    ba1._PALLAS_DEFAULT = False

    print(json.dumps(report))


if __name__ == "__main__":
    main()
