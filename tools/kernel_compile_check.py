"""AOT-compile every Pallas kernel for the attached TPU — the fast
Mosaic-backend gate.

interpret-mode tests validate numerics and jit.lower() validates the
jaxpr->Mosaic translation, but several legalization failures (i1 vector
while-carries, i8->i1 trunci, scoped-VMEM overflow) only surface in the
Mosaic->machine-code backend, i.e. in a real (remote) TPU compile.  This
script compiles each kernel alone, so a failure names its kernel in
seconds instead of surfacing mid-way through tools/tpu_smoke.py.

    python tools/kernel_compile_check.py
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    if dev.platform != "tpu":
        print("NOT a TPU — the Mosaic backend gate needs hardware")
        sys.exit(1)

    from atracdenc_tpu.ops.pallas_quant import quant_cost_full, quant_cost_plain
    from atracdenc_tpu.ops.pallas_alloc import at1_allocate_block
    from atracdenc_tpu.ops.pallas_rate import rate_control_block
    from atracdenc_tpu.models.atrac3.encoder import _GATHER_MASK

    n = 8
    checks = [
        ("quant_cost_full",
         lambda: jax.jit(lambda a: quant_cost_full(a, _GATHER_MASK))
         .lower(jnp.zeros((n, 32, 128), jnp.float32)).compile()),
        ("quant_cost_plain",
         lambda: jax.jit(
             lambda a: quant_cost_plain(a, np.asarray(_GATHER_MASK) > 0))
         .lower(jnp.zeros((n, 32, 128), jnp.float32)).compile()),
        ("at1_allocate_block",
         lambda: jax.jit(at1_allocate_block).lower(
             jnp.zeros((n, 52), jnp.int32), jnp.zeros((n, 52)),
             jnp.zeros((n, 3), bool), jnp.zeros((n,))).compile()),
        ("rate_control_block",
         lambda: jax.jit(lambda *a: rate_control_block(*a)).lower(
             jnp.zeros((n, 32)), jnp.zeros((n, 32), bool),
             jnp.zeros((n, 32), jnp.int32), jnp.zeros((n,)),
             jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
             jnp.zeros((n, 32, 8)), jnp.zeros((n, 32, 8), jnp.int32),
             jnp.zeros((n, 32, 8), jnp.int32),
             jnp.zeros((n, 32), jnp.int32), jnp.zeros((n, 32), jnp.int32),
             jnp.zeros((n, 32), jnp.int32), jnp.zeros((n, 32), jnp.int32),
             jnp.zeros((n, 32, 8), jnp.int32)).compile()),
    ]
    failed = []
    for name, fn in checks:
        t0 = time.time()
        try:
            fn()
            print(f"{name:22s} COMPILE OK ({time.time() - t0:.1f}s)")
        except Exception as e:
            text = str(e)
            keep = [ln for ln in text.split("\n")
                    if any(k in ln for k in (
                        "Mosaic", "trunci", "vmem", "Unsupported", "scoped",
                        "NotImplemented", "location", "MLIR"))]
            print(f"{name:22s} FAIL: {text.splitlines()[0][:160]}")
            for ln in keep[:8]:
                print("   |", ln.strip()[:240])
            failed.append(name)
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)
    print("ALL KERNELS COMPILE")


if __name__ == "__main__":
    main()
