"""Honest device timing on the axon relay.

`jax.block_until_ready` is a NO-OP on the axon PJRT backend (measured: a
687-GFLOP matmul chain "completes" in 0.06 ms under block_until_ready but
takes 30 ms under device_get).  Every timing in tools/ therefore measures
K back-to-back dispatches ended by ONE tiny `device_get`, which forces the
device stream to drain; the relay round trip (~20-25 ms) is measured
separately with an empty drain and subtracted.  With K >= 8 the residual
RTT noise is well under a millisecond per iteration.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["drain", "measure", "make_timeit"]


def _first_leaf(tree):
    return jax.tree_util.tree_leaves(tree)[0]


def drain(out):
    """Force completion of everything queued before `out` (tiny transfer)."""
    leaf = _first_leaf(out)
    jax.device_get(leaf.ravel()[:1])


def rtt(samples=3):
    """Round-trip time of an empty drain (queue already idle)."""
    x = jnp.zeros((1,), jnp.float32)
    jax.device_get(x)                     # ensure materialized
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        jax.device_get(x)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(fn, *args, iters=8, inner_rtt=None):
    """Seconds per call of jitted `fn(*args)`, RTT-corrected."""
    out = fn(*args)
    drain(out)                            # warm / compile
    if inner_rtt is None:
        inner_rtt = rtt()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        drain(out)
        dt = (time.perf_counter() - t0 - inner_rtt) / iters
        best = min(best, dt)
    return max(best, 0.0)


def make_timeit(iters=8, unit_items=None, fmt=None):
    """Returns timeit(name, fn, *args) printing `name  X ms [rate]`."""
    base = rtt()

    def timeit(name, fn, *a):
        dt = measure(fn, *a, iters=iters, inner_rtt=base)
        line = f"{name:32s} {dt * 1e3:9.2f} ms"
        if unit_items:
            line += f"   {unit_items / max(dt, 1e-9):12.0f} items/s"
        print(line, flush=True)
        out = fn(*a)
        drain(out)
        return out

    return timeit
