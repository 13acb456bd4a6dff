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
import os
import time

import numpy as np

REF_FRAMES_PER_S = 1046.0        # reference at3enc, 1 core (BASELINE.md)
REF_AT1_UNITS_PER_S = 11670.0    # reference at1enc, 1 core
REF_AT3P_FRAMES_PER_S = 930.0    # at3p_oracle (GHA-off flow), 1 core user
                                 # time, 1024 stereo frames, 2026-08-17


def _on_tpu():
    import jax.extend.backend as jxb
    return jxb.get_backend().platform == "tpu"


def _pipeline_rate(batched, x, n_items, iters=6, depth=2):
    """Steady-state items/s of jitted `batched` with transfer overlap.

    The tunneled relay's D2H link (~20-40 MB/s, fluctuating) is the
    binding resource for every codec here, so the pump keeps `depth`
    batches in flight and starts each result's host copy as soon as it is
    enqueued (copy_to_host_async); all bytes still arrive on the host
    inside the timed window — this is the shape a production transcoder's
    output pump takes, not a measurement trick."""
    import jax

    def _start_copy(y):
        for leaf in jax.tree.leaves(y):
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass

    out = jax.device_get(batched(x))     # compile + warm
    del out
    q = []
    t0 = time.perf_counter()
    for _ in range(iters):
        y = batched(x)
        _start_copy(y)
        q.append(y)
        if len(q) > depth:
            jax.device_get(q.pop(0))
    while q:
        jax.device_get(q.pop(0))
    return n_items / ((time.perf_counter() - t0) / iters)


def _bench_at1(pcm, use_pallas=False, compute_only=False):
    import jax
    import jax.numpy as jnp
    from atracdenc_tpu.models.atrac1.encoder import encode_frames
    from atracdenc_tpu.models.atrac1.device_pack import pack_device

    s, c, t = pcm.shape
    units = s * c * (t // 512)
    x = jnp.asarray(pcm)

    def one(p):
        planes = encode_frames(p, use_pallas=use_pallas)
        merged = {k: jnp.swapaxes(v, 0, 1).reshape((-1,) + v.shape[2:])
                  for k, v in planes.items()}
        return pack_device(merged)

    batched = jax.jit(lambda xs: jax.vmap(one)(xs))
    if compute_only:
        # chip-only rate (RTT-corrected dispatch drain): at 212 B/unit the
        # tunnel's D2H link saturates long before the chip does, so the
        # wall number mostly measures the relay — this one measures AT1
        from tools._timing import measure as _tmeasure
        return units / _tmeasure(batched, x, iters=4)
    return _pipeline_rate(batched, x, units)


def _bench_at3p(pcm, compute_only=False):
    """Full-GHA AT3P, stream-vmapped fused device path: PQF, GHA tonal
    model, MDCT, VLC costing, numQU shrink AND serialization in one jit
    (encoder.encode_frames_bytes); only frame bytes leave the chip."""
    import jax
    import jax.numpy as jnp
    from atracdenc_tpu.models.atrac3p.encoder import encode_frames_bytes

    s, c, t = pcm.shape
    nframes = t // 2048
    x = jnp.asarray(pcm)
    batched = jax.jit(lambda xs: jax.vmap(
        lambda p: encode_frames_bytes(p, c, gha_mask=7))(xs))
    if compute_only:
        from tools._timing import measure as _tmeasure
        return s * nframes / _tmeasure(batched, x, iters=4)
    return _pipeline_rate(batched, x, s * nframes)


def _ensure_backend(probe_timeout_s=180):
    """The axon TPU relay can hang indefinitely during device claim (seen
    2026-08-18: enumeration never returns while the relay is down).  Probe
    device init in a subprocess first and fall back to CPU on hang/failure
    so the bench always completes and prints its JSON line."""
    import os
    import subprocess
    import sys
    if os.environ.get("JAX_PLATFORMS", "axon") == "cpu":
        return
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout_s, capture_output=True)
        if r.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        pass
    print("bench: TPU backend unavailable (device claim hung/failed); "
          "re-execing on CPU", file=sys.stderr)
    sys.stderr.flush()
    # the axon site hook (PYTHONPATH) captures its env at interpreter
    # startup, so mutating os.environ here is too late — re-exec with a
    # clean env (JAX_PLATFORMS=cpu short-circuits the probe on re-entry)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)], env)


def main():
    _ensure_backend()
    import jax
    import jax.numpy as jnp
    from atracdenc_tpu.models.atrac3.encoder import encode_frames
    from atracdenc_tpu.models.atrac3.device_pack import pack_device_batch

    # 64x256 = 16,384 frames/batch: the sweep (tools/sweep_at3_batch.py,
    # 2026-08-20 v5e) peaks here; 32,768-frame batches crash the remote
    # compile helper on this relay, 8,192 leaves ~20% on the table
    streams, channels, nframes = 64, 2, 256
    cpu_fallback = jax.default_backend() == "cpu"
    if cpu_fallback:
        # keep the CPU-fallback run finishable on a 1-core host; the
        # number is a liveness signal, not a TPU measurement
        streams, nframes = 4, 32
    t = 1024 * nframes
    rng = np.random.default_rng(42)
    n = np.arange(t, dtype=np.float64)
    base = 0.4 * np.sin(2 * np.pi * 997.0 * n / 44100.0)
    pcm = np.clip(base[None, None, :] * np.asarray([1.0, 0.8])[None, :, None]
                  + 0.05 * rng.standard_normal((streams, channels, t)),
                  -1, 1).astype(np.float32)
    x = jnp.asarray(pcm)

    def measure_at3(use_pallas):
        # the flag is a STATIC jit arg all the way down (a module-global
        # flip would not retrace the cached executable — the round-3 bench
        # silently measured the XLA path twice because of exactly that)
        batched = jax.jit(lambda xs: pack_device_batch(
            jax.vmap(lambda p: encode_frames(
                p, frame_bytes=384, js=False,
                no_gain_control=False, no_tonal=False,
                use_pallas_rate=use_pallas))(xs), 384, False))
        # steady-state pipeline: batch i+1 computes on-device while batch
        # i's bytes transfer out
        return _pipeline_rate(batched, x, streams * nframes)

    # XLA vs fused-Pallas rate control: byte-identical outputs, so take
    # whichever schedules better on this chip (Pallas only attempted on
    # real TPU — interpret mode on CPU is for correctness, not speed)
    fps_xla = measure_at3(False)
    fps_pls = measure_at3(True) if _on_tpu() else 0.0
    fps = max(fps_xla, fps_pls)

    # Diagnostics for the wall numbers above: the tunnel relay's D2H link
    # fluctuates 6-41 MB/s over hours (measured 2026-08-20/21) and every
    # codec's end-to-end rate is eventually link-bound, so record the
    # link speed at measurement time plus the chip-only AT3 rate
    # (RTT-corrected dispatch drain, tools/_timing) — the number that
    # reflects the encoder itself rather than the relay's mood.
    d2h_mbps = 0.0
    fps_compute = 0.0
    if _on_tpu():
        try:
            # a FRESH output buffer per fetch: device_get of the same
            # jax.Array is served from its cached host copy after the
            # first call and would measure nothing
            pf = jax.jit(lambda a, s: a + s)
            pbase = jnp.zeros(8 * 1024 * 1024, jnp.uint8)
            jax.device_get(pf(pbase, np.uint8(1)))
            t0 = time.perf_counter()
            for i in range(3):
                jax.device_get(pf(pbase, np.uint8(i)))
            d2h_mbps = 8.0 * 3 / (time.perf_counter() - t0)
        except Exception:
            pass
        try:
            from tools._timing import measure as _tmeasure
            batched = jax.jit(lambda xs: pack_device_batch(
                jax.vmap(lambda p: encode_frames(
                    p, frame_bytes=384, js=False, no_gain_control=False,
                    no_tonal=False, use_pallas_rate=True))(xs), 384, False))
            fps_compute = streams * nframes / _tmeasure(batched, x, iters=4)
        except Exception:
            pass

    at1_rate = _bench_at1(pcm[:8, :, :512 * 512])
    at1_compute = at3p_compute = 0.0
    if _on_tpu():
        at1_rate = max(at1_rate, _bench_at1(pcm[:8, :, :512 * 512],
                                            use_pallas=True))
        try:
            at1_compute = _bench_at1(pcm[:8, :, :512 * 512],
                                     use_pallas=True, compute_only=True)
        except Exception:
            pass
    at3p_rate = _bench_at3p(pcm[:8, :, :2048 * 128])
    if _on_tpu():
        try:
            at3p_compute = _bench_at3p(pcm[:8, :, :2048 * 128],
                                       compute_only=True)
        except Exception:
            pass

    print(json.dumps({
        "metric": "atrac3_default_encode_throughput",
        "value": round(fps, 1),
        "unit": "stereo_frames_per_s",
        "vs_baseline": round(fps / REF_FRAMES_PER_S, 2),
        "extra": {
            # 'cpu' here means the TPU relay was down and the bench
            # re-execed on the host CPU as a liveness fallback — the
            # number is NOT a TPU measurement (see _ensure_backend)
            "platform": jax.default_backend(),
            "at3_fps_xla_rate_ctl": round(fps_xla, 1),
            "at3_fps_pallas_rate_ctl": round(fps_pls, 1),
            "at3_fps_compute_only": round(fps_compute, 1),
            "d2h_link_mbps": round(d2h_mbps, 1),
            "atrac1_units_per_s": round(at1_rate, 1),
            "atrac1_vs_baseline": round(at1_rate / REF_AT1_UNITS_PER_S, 2),
            "at1_units_per_s_compute_only": round(at1_compute, 1),
            "at1_vs_baseline_compute_only": round(
                at1_compute / REF_AT1_UNITS_PER_S, 2),
            "at3p_fps_compute_only": round(at3p_compute, 1),
            "at3p_gha_frames_per_s": round(at3p_rate, 1),
            "at3p_vs_gha_off_oracle": round(
                at3p_rate / REF_AT3P_FRAMES_PER_S, 2),
        },
    }))


if __name__ == "__main__":
    main()
