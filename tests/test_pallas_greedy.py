"""Equality: ops/pallas_greedy.greedy_scan (interpret mode) vs the unrolled
lax.scan formulation of the EA greedy-accept recurrence in ops/quant."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atracdenc_tpu.ops.pallas_greedy import greedy_scan


def _scan_ref(a, b, elig, e1, e2):
    def step(e2_run, xs):
        elig_k, a_k, b_k = xs
        ex = (e2_run - a_k) + b_k
        accept = elig_k & (jnp.abs(ex - e1) < jnp.abs(e2_run - e1))
        return jnp.where(accept, ex, e2_run), accept

    e2_fin, acc = jax.lax.scan(
        step, e2, (jnp.moveaxis(elig, -1, 0), jnp.moveaxis(a, -1, 0),
                   jnp.moveaxis(b, -1, 0)), unroll=True)
    return e2_fin, jnp.moveaxis(acc, 0, -1)


@pytest.mark.parametrize("rows,L", [(7, 32), (33, 64), (130, 128)])
def test_greedy_scan_matches_unrolled_scan(rows, L):
    rng = np.random.default_rng(rows * L)
    # realistic magnitudes: a/b are m^2*inv2 with |m| <= 32
    m = rng.integers(-32, 33, (rows, L))
    mn = m + np.where(m >= 0, 1, -1)
    inv2 = rng.random((rows, 1)).astype(np.float32) + 0.01
    a = jnp.asarray((m * m).astype(np.float32) * inv2)
    b = jnp.asarray((mn * mn).astype(np.float32) * inv2)
    elig = jnp.asarray(rng.random((rows, L)) < 0.4)
    e1 = jnp.asarray(rng.random(rows).astype(np.float32) * 50.0)
    e2 = jnp.asarray(rng.random(rows).astype(np.float32) * 50.0)

    e2_ref, acc_ref = jax.jit(_scan_ref)(a, b, elig, e1, e2)
    e2_k, acc_k = greedy_scan(a, b, elig, e1, e2, interpret=True)
    assert np.array_equal(np.asarray(e2_ref), np.asarray(e2_k))
    assert np.array_equal(np.asarray(acc_ref), np.asarray(acc_k))
