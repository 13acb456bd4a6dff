"""Benchmark: ATRAC3 default-mode encode throughput on the available chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ encoder (dcherednik/atracdenc, -O2, single core)
in its default mode (gain control + tonal components, 132 kbit/s LP2)
measured on this machine at 1046 stereo frames/s (one frame = 1024 samples
x 2 channels; realtime factor ~24x).  Measured 2026-08-16 with an oracle
binary built from /root/reference (raw-float I/O, no libsndfile) on a
47.5 s stereo corpus (997 Hz tone + noise).

The whole pipeline — DSP, psychoacoustics, rate control, AND bitstream
serialization (models/atrac3/device_pack.py + ops/bitdeposit.py) — runs on
device; only the final 384-byte frames are transferred (0.8 MB/batch vs the
19 MB of mantissa planes the old host-packing pipeline moved).  Container
framing (96-byte OMA header) is the only host work left and is negligible.
"""
import json
import time

import numpy as np

REF_FRAMES_PER_S = 1046.0


def main():
    import jax
    import jax.numpy as jnp
    from atracdenc_tpu.models.atrac3.encoder import encode_frames
    from atracdenc_tpu.models.atrac3.device_pack import pack_device_batch

    streams, channels, nframes = 32, 2, 256
    t = 1024 * nframes
    rng = np.random.default_rng(42)
    n = np.arange(t, dtype=np.float64)
    base = 0.4 * np.sin(2 * np.pi * 997.0 * n / 44100.0)
    pcm = np.clip(base[None, None, :] * np.asarray([1.0, 0.8])[None, :, None]
                  + 0.05 * rng.standard_normal((streams, channels, t)),
                  -1, 1).astype(np.float32)
    x = jnp.asarray(pcm)

    batched = jax.jit(lambda xs: pack_device_batch(
        jax.vmap(lambda p: encode_frames(
            p, frame_bytes=384, js=False,
            no_gain_control=False, no_tonal=False))(xs), 384, False))
    frames = jax.device_get(batched(x))    # compile + warm up

    # steady-state pipeline: batch i+1 computes on-device while batch i's
    # bytes transfer out; exactly `iters` computations inside the timer
    iters = 4
    pending = None
    t0 = time.perf_counter()
    for _ in range(iters):
        nxt = batched(x)                   # async dispatch
        if pending is not None:
            frames = jax.device_get(pending)   # overlaps with nxt's compute
        pending = nxt
    frames = jax.device_get(pending)
    total_s = (time.perf_counter() - t0) / iters
    assert frames.shape == (streams, nframes, 384)

    fps = streams * nframes / total_s
    print(json.dumps({
        "metric": "atrac3_default_encode_throughput",
        "value": round(fps, 1),
        "unit": "stereo_frames_per_s",
        "vs_baseline": round(fps / REF_FRAMES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
