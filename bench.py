"""Benchmark: ATRAC1 encode throughput on the available accelerator.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ encoder (dcherednik/atracdenc, -O2, single core)
measured on this machine at 22,207 sound-units/s (one unit = 512 samples of
one channel; stereo realtime factor ~129x).  Measured 2026-08-16 with an
oracle binary built from /root/reference (raw-float I/O, no libsndfile).
"""
import json
import time

import numpy as np

REF_UNITS_PER_S = 22207.0


def main():
    import jax
    import jax.numpy as jnp
    from atracdenc_tpu.models.atrac1.encoder import encode_frames
    from atracdenc_tpu.models.atrac1 import frame as at1_frame

    streams, channels, nframes = 16, 2, 256
    t = 512 * nframes
    rng = np.random.default_rng(0)
    n = np.arange(t, dtype=np.float64)
    base = 0.4 * np.sin(2 * np.pi * 997.0 * n / 44100.0)
    pcm = np.clip(base[None, None, :]
                  + 0.1 * rng.standard_normal((streams, channels, t)),
                  -0.95, 0.95).astype(np.float32)
    x = jnp.asarray(pcm)

    batched = jax.jit(jax.vmap(lambda p: encode_frames(p)))
    planes = jax.block_until_ready(batched(x))  # compile + warm up

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        planes = batched(x)
    jax.block_until_ready(planes)
    device_s = (time.perf_counter() - t0) / iters

    # host-side bitstream finalization (native C++ packer)
    host_planes = {k: np.asarray(v).reshape((-1,) + v.shape[3:])
                   for k, v in planes.items()}
    t0 = time.perf_counter()
    frames = at1_frame.pack(host_planes)
    pack_s = time.perf_counter() - t0
    assert frames.shape == (streams * channels * nframes, 212)

    units = streams * channels * nframes
    total_s = device_s + pack_s
    ups = units / total_s
    print(json.dumps({
        "metric": "atrac1_encode_throughput",
        "value": round(ups, 1),
        "unit": "sound_units_per_s",
        "vs_baseline": round(ups / REF_UNITS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
