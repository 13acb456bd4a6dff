"""Multi-host distributed batch transcoding.

The reference is strictly single-process (SURVEY.md §2.7); this layer is a
new capability.  Topology model (the scaling-book recipe):

  * DCN (across hosts): independent TRACKS — the corpus is sharded by
    process id; no cross-host traffic is needed for the audio itself.
  * ICI (across a host's chips): the (dp, sp) mesh of parallel/mesh.py —
    streams over dp, a track's time axis over sp with XLA-inserted halo
    exchanges for the QMF/MDCT convolutions.
  * A GLOBAL mesh path (`encode_batch_global`) shards one batch over every
    chip of every host via jax.make_array_from_process_local_data — used
    by the scaling harness to measure true multi-process SPMD throughput
    (compile once, all hosts step in lockstep).

Validated without multi-chip hardware: `tools/scaling_bench.py` launches
N processes on a virtual CPU mesh (jax.distributed with local TCP), the
same mechanism a real TPU pod uses.
"""
import os

import numpy as np

__all__ = ["initialize", "corpus_shard", "global_mesh",
           "encode_batch_global", "local_batch_slice"]


def initialize(coordinator=None, num_processes=None, process_id=None,
               local_devices=None):
    """jax.distributed.initialize wrapper.

    For CPU-mesh validation set `local_devices` to force
    --xla_force_host_platform_device_count on this process BEFORE jax
    imports (so call this before anything touches jax).
    """
    if local_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count"
                f"={local_devices}").strip()
    import jax
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax


def corpus_shard(paths, process_id, num_processes):
    """Deterministic round-robin split of a track corpus across hosts
    (DCN-level data parallelism; tracks are independent)."""
    return list(paths)[process_id::num_processes]


def global_mesh(dp=None):
    """(dp, sp) mesh over ALL global devices (every process's chips)."""
    import jax
    from jax.sharding import Mesh
    devices = np.asarray(jax.devices())
    n = len(devices)
    if dp is None:
        dp = n          # default: pure stream parallelism across the pod
    sp = n // dp
    return Mesh(devices.reshape(dp, sp), ("dp", "sp"))


def local_batch_slice(global_streams, mesh):
    """(start, count) of the stream axis this process contributes."""
    import jax
    dp = mesh.shape["dp"]
    if global_streams % dp:
        raise ValueError(
            f"global_streams={global_streams} must divide the dp axis "
            f"({dp}); pad the batch — a floor split would silently drop "
            f"the last {global_streams % dp} stream(s)")
    per = global_streams // dp
    # which dp rows live on this process
    rows = sorted({i for (i, _), d in np.ndenumerate(mesh.devices)
                   if d.process_index == jax.process_index()})
    return rows[0] * per, len(rows) * per


def encode_batch_global(local_pcm, mesh, frame_bytes=384, js=False):
    """Encode a GLOBAL batch sharded over every host's chips.

    local_pcm: this process's [S_local, C, T] slice (stream-major order by
    process, as produced by local_batch_slice).  Returns this process's
    shard of the final frame bytes [S_local, F, frame_bytes] plus the
    global stream count.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from atracdenc_tpu.models.atrac3.encoder import encode_frames_bytes

    in_sharding = NamedSharding(mesh, P("dp", None, "sp"))
    out_sharding = NamedSharding(mesh, P("dp"))
    garr = jax.make_array_from_process_local_data(in_sharding, local_pcm)

    def enc(xs):
        return jax.vmap(lambda p: encode_frames_bytes(
            p, frame_bytes=frame_bytes, js=js,
            no_gain_control=False, no_tonal=False))(xs)

    fn = jax.jit(enc, in_shardings=in_sharding, out_shardings=out_sharding)
    out = fn(garr)
    # collect this process's shards; P("dp") output is REPLICATED over the
    # sp axis, so each dp-row shard appears sp times among the addressable
    # shards — dedup by stream-axis start or every track's frames would be
    # concatenated sp-fold
    seen = {}
    for s in out.addressable_shards:
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)], axis=0)
