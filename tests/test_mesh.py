"""Multi-chip sharding correctness on the 8-device virtual CPU mesh.

Round-1 only asserted output SHAPES; these tests assert that sharded
execution produces byte/bit-identical results to single-device execution
for every (dp, sp) factorization of the mesh — the property that makes the
(stream, time) sharding a pure throughput knob.  (Reference analog: the
fake-backend discipline of test/ut/encode_ut.cpp.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atracdenc_tpu.parallel import mesh as M

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """Deserializing multi-device executables from the persistent jit
    cache segfaults XLA-CPU mid-suite (observed twice at
    compilation_cache.get_executable_and_time loading the sharded AT3
    bytes executable).  Sharded compiles skip the on-disk cache; every
    other module keeps it."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)


def _pcm(s, t, seed=0):
    rng = np.random.default_rng(seed)
    n = np.arange(t)
    base = 0.4 * np.sin(2 * np.pi * 997.0 * n / 44100.0)
    return np.clip(base[None, None, :]
                   + 0.05 * rng.standard_normal((s, 2, t)),
                   -1, 1).astype(np.float32)


def _mesh(dp, sp):
    devs = np.asarray(jax.devices()[: dp * sp]).reshape(dp, sp)
    from jax.sharding import Mesh
    return Mesh(devs, ("dp", "sp"))


@pytest.mark.parametrize("dp,sp", [(8, 1), (2, 4), (1, 8)])
def test_at3_bytes_sharded_equal_unsharded(dp, sp):
    pcm = _pcm(max(dp, 2) * 2, 1024 * 2 * sp)
    ref = np.asarray(M.encode_batch_at3_bytes_sharded(
        jnp.asarray(pcm), _mesh(1, 1)))
    out = np.asarray(M.encode_batch_at3_bytes_sharded(
        jnp.asarray(pcm), _mesh(dp, sp)))
    assert (ref == out).all()


@pytest.mark.parametrize("dp,sp", [(2, 4)])
def test_at1_planes_sharded_equal_unsharded(dp, sp):
    pcm = _pcm(4, 512 * 2 * sp, seed=1)
    ref = M.encode_batch_sharded(jnp.asarray(pcm), _mesh(1, 1))
    out = M.encode_batch_sharded(jnp.asarray(pcm), _mesh(dp, sp))
    for k in ref:
        assert np.array_equal(np.asarray(ref[k]), np.asarray(out[k])), k


def test_encode_batch_global_dedups_replicated_shards():
    """P('dp') output is replicated over the sp axis: with sp > 1 each
    dp-row shard appears sp times among addressable_shards — the collector
    must return each stream exactly once (regression: rows duplicated
    sp-fold)."""
    from atracdenc_tpu.parallel import distributed as D

    pcm = _pcm(4, 1024 * 2, seed=2)
    mesh = _mesh(4, 2)
    out = D.encode_batch_global(pcm, mesh)
    assert out.shape[0] == 4
    ref = D.encode_batch_global(pcm, _mesh(1, 1))
    assert (out == ref).all()


def test_local_batch_slice_rejects_indivisible():
    from atracdenc_tpu.parallel import distributed as D

    with pytest.raises(ValueError, match="divide the dp axis"):
        D.local_batch_slice(7, _mesh(4, 2))
