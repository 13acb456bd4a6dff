"""Scaling-efficiency harness: frames/s at 1 device, an 8-device virtual
mesh, and N distributed processes (jax.distributed over local TCP).

On this machine the backend is a virtual CPU mesh — the harness validates
the MECHANISM (multi-process SPMD with jax.distributed, global arrays,
sharded output collection) and measures relative scaling of the identical
program; absolute numbers for the TPU pod path come from bench.py on real
chips.  Usage:

  python tools/scaling_bench.py                  # all configs, prints table
  python tools/scaling_bench.py --worker ...     # internal (subprocess)
"""
import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

STREAMS = 8          # global batch
FRAMES = 8           # per stream
COORD = "127.0.0.1:12355"


def make_pcm(streams, frames):
    import numpy as np
    t = 1024 * frames
    rng = np.random.default_rng(11)
    n = np.arange(t, dtype=np.float64)
    base = 0.4 * np.sin(2 * np.pi * 997.0 * n / 44100.0)
    return np.clip(
        base[None, None, :] + 0.05 * rng.standard_normal((streams, 2, t)),
        -1, 1).astype(np.float32)


def run_config(n_processes, devices_per_process, dp=None, check=False):
    """Launch worker subprocesses; return (frames_per_s, sample_bytes)."""
    procs = []
    outs = []
    for pid in range(n_processes):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--np", str(n_processes), "--pid", str(pid),
               "--devices", str(devices_per_process)]
        if dp is not None:
            cmd += ["--dp", str(dp)]
        if check:
            cmd += ["--check"]
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        env.pop("PYTHONPATH", None)      # keep TPU plugins out of workers
        outs.append(open(f"/tmp/scaling_worker_{pid}.log", "w"))
        procs.append(subprocess.Popen(cmd, env=env, stdout=outs[-1],
                                      stderr=subprocess.STDOUT, cwd=REPO))
    rc = [p.wait() for p in procs]
    for o in outs:
        o.close()
    if any(rc):
        for pid in range(n_processes):
            sys.stderr.write(open(f"/tmp/scaling_worker_{pid}.log").read())
        raise RuntimeError(f"workers failed: {rc}")
    res = json.load(open("/tmp/scaling_result_0.json"))
    return res


def worker(args):
    sys.path.insert(0, REPO)
    from atracdenc_tpu.parallel import distributed as D
    jax = D.initialize(COORD, args.np, args.pid,
                       local_devices=args.devices)
    import numpy as np

    mesh = D.global_mesh(dp=args.dp)
    pcm = make_pcm(STREAMS, FRAMES)
    start, count = D.local_batch_slice(STREAMS, mesh)
    local = pcm[start:start + count]

    out = D.encode_batch_global(local, mesh)          # compile + warm
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = D.encode_batch_global(local, mesh)
    dt = (time.perf_counter() - t0) / iters
    fps = STREAMS * FRAMES / dt
    if args.check:
        np.save(f"/tmp/scaling_shard_p{args.pid}_np{args.np}.npy", out)
    if args.pid == 0:
        res = {"frames_per_s": round(fps, 2),
               "n_processes": args.np,
               "devices_per_process": args.devices,
               "start": start, "count": count,
               "sample": out[0, 0, :8].tolist()}
        if args.check:
            import hashlib
            res["bytes_sha"] = hashlib.sha256(
                np.ascontiguousarray(out).tobytes()).hexdigest()[:16]
            res["local_shape"] = list(out.shape)
        json.dump(res, open(f"/tmp/scaling_result_{args.pid}.json", "w"))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--np", type=int, default=1)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--dp", type=int, default=None)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.worker:
        sys.exit(worker(args))

    rows = []
    shas = {}
    for label, nproc, dev in [("1 device", 1, 1),
                              ("1 proc x 8 dev", 1, 8),
                              ("2 proc x 4 dev", 2, 4)]:
        res = run_config(nproc, dev, check=True)
        rows.append((label, nproc * dev, res["frames_per_s"]))
        shas[label] = res.get("bytes_sha")
        print(f"{label:18s} {res['frames_per_s']:10.1f} frames/s  "
              f"sha {res.get('bytes_sha')} shard {res.get('local_shape')}",
              flush=True)
    # process 0's addressable slice shrinks with nproc, so compare the
    # single-process configs (full batch) for byte equality; the 2-proc run
    # still validates the distributed mechanism end-to-end
    assert shas["1 device"] == shas["1 proc x 8 dev"], \
        "8-device mesh output != single device output"
    import numpy as np
    full = np.load("/tmp/scaling_shard_p0_np1.npy")
    two = np.concatenate([np.load("/tmp/scaling_shard_p0_np2.npy"),
                          np.load("/tmp/scaling_shard_p1_np2.npy")], axis=0)
    assert np.array_equal(full, two), \
        "2-process distributed output != single-device output"
    print("byte checks OK: 8-dev mesh == 1-dev; 2-proc shards == 1-dev")
    base = rows[0][2]
    print("\nconfig              devices  frames/s   throughput kept")
    print("(one PHYSICAL core backs every config here: virtual devices")
    print(" measure sharding/process overhead, not real scaling; real")
    print(" per-chip scaling comes from bench.py on TPU hardware)")
    for label, ndev, fps in rows:
        eff = fps / base
        print(f"{label:18s} {ndev:7d} {fps:10.1f}   {eff*100:6.1f}%")


if __name__ == "__main__":
    main()
