"""atracdenc_tpu — a TPU-native ATRAC1/ATRAC3/ATRAC3+ audio codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ transcoder `atracdenc` (dcherednik/atracdenc).  The reference processes
audio one 512/1024/2048-sample frame at a time through stateful C++ objects;
this framework instead treats a whole track (or a slab of it) as a tensor of
frames and runs every DSP stage batched over ``[stream, frame, channel, ...]``
axes so the work maps onto the TPU MXU/VPU, with cross-frame state expressed
as halos (filterbank histories, MDCT overlap) or ``lax.scan`` carries
(loudness IIR).  Variable-length entropy/bitstream serialization runs on the
host (C++ native library with a NumPy fallback).

Layout:
  ops/         shared DSP kernels (MDCT, QMF, transient detect, scaling, psy)
  models/      codec pipelines (atrac1, atrac3, atrac3p)
  containers/  AEA / OMA / RIFF-AT3 / RealMedia / RAW framing
  io/          PCM (WAV) reading and writing
  parallel/    device-mesh sharding of the batch transcoder
  utils/       bit packing and host-side helpers
  native/      C++ host runtime (bitstream finalization, containers)
"""

__version__ = "0.1.0"

# Dispatch-path discipline: module-level table constants in this package
# are HOST numpy arrays, never jax.Arrays (see utils/npconst.py).  A
# jax.Array captured as a jit closure constant is hoisted into a runtime
# argument of the executable, and on the axon relay (remote TPU) the FIRST
# such trace permanently drops the whole process off the C++ fast dispatch
# path: every subsequent executable launch — related or not — synchronizes
# with the device at ~25 ms per round trip (measured 0.03 ms -> 25 ms per
# dispatch on the v5e relay; PERF.md "dispatch-path poisoning").  numpy
# closure constants are baked into the HLO as literals instead — zero
# per-call cost at any size.  (jax 0.9's jax_use_simplified_jaxpr_constants
# flag also avoids the poisoning for small consts, but it breaks nested-jit
# tracing of numpy consts — TypedNdArray has no .sharding — so this package
# relies on the numpy-constant rule, enforced by
# tests/test_dispatch_hygiene.py.)
