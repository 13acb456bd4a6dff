"""TPU smoke: compile + equality-check every Pallas kernel on the real chip.

The kernels are equality-pinned in interpret mode by tests/test_pallas_*;
this script is the hardware gate: Mosaic compilation, real-TPU numerics,
and an end-to-end byte compare, in under a minute.  Run it FIRST whenever
the chip comes back before any perf campaign:

    python tools/tpu_smoke.py
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
        print("NOT a TPU — smoke must run on hardware"); sys.exit(1)

    from atracdenc_tpu.models.atrac3 import bitalloc
    from atracdenc_tpu.models.atrac3.encoder import _GATHER_MASK

    rng = np.random.default_rng(7)
    scaled = (0.999 * np.tanh(rng.standard_normal((6, 32, 128)))
              ).astype(np.float32)
    scaled = jnp.asarray(scaled * np.asarray(_GATHER_MASK))

    t0 = time.time()
    qt_x = jax.tree.map(np.asarray,
                        bitalloc.quant_tensors(scaled, _GATHER_MASK,
                                               use_pallas=False))
    t1 = time.time()
    qt_p = jax.tree.map(np.asarray,
                        bitalloc.quant_tensors(scaled, _GATHER_MASK,
                                               use_pallas=True))
    t2 = time.time()
    assert np.array_equal(qt_x["vlc"], qt_p["vlc"]), "quant_cost_full vlc"
    assert np.array_equal(qt_x["clc"], qt_p["clc"]), "quant_cost_full clc"
    np.testing.assert_allclose(qt_x["err"], qt_p["err"], rtol=1e-6)
    print(f"quant_cost_full OK (xla {t1-t0:.1f}s, pallas {t2-t1:.1f}s "
          "incl compile)")

    # full rate control through the fused bisection
    spread = jnp.asarray(np.full((6,), 0.5, np.float32))
    sfi = jnp.asarray(rng.integers(0, 50, (6, 32)).astype(np.int32))
    gsc = jnp.ones((6, 4), jnp.float32)
    energy = jnp.asarray(
        np.abs(rng.standard_normal((6, 32))).astype(np.float32))
    loud = jnp.asarray(np.full((6,), 0.5, np.float32))
    tb = jnp.asarray(np.full((6,), 384 * 4 - 200, np.int32))
    args = (sfi, gsc, energy, spread, loud, tb)
    ax = bitalloc.allocate(qt_x_j := jax.tree.map(jnp.asarray, qt_x),
                           *args, use_pallas=False)
    ap = bitalloc.allocate(qt_x_j, *args, use_pallas=True)
    for x, p, name in zip(ax, ap, ("num_bfu", "mode", "wl")):
        assert np.array_equal(np.asarray(x), np.asarray(p)), f"alloc {name}"
    print("bisect_block OK")

    from atracdenc_tpu.models.atrac1 import bitalloc as b1
    from atracdenc_tpu.models.atrac1.encoder import encode_frames
    from atracdenc_tpu.models.atrac3.encoder import encode_frames_bytes

    pcm = (0.3 * rng.standard_normal((2, 1024 * 8))).astype(np.float32)
    x = jnp.asarray(pcm)

    def at3_bytes(flag):
        bitalloc._PALLAS_DEFAULT = flag
        return np.asarray(jax.jit(
            lambda p: encode_frames_bytes(p, frame_bytes=384, js=False,
                                          no_gain_control=False,
                                          no_tonal=False))(x))

    bx, bp = at3_bytes(False), at3_bytes(True)
    bitalloc._PALLAS_DEFAULT = False
    assert np.array_equal(bx, bp), "AT3 e2e bytes XLA vs Pallas"
    print("AT3 e2e bytes identical")

    def at1_planes(flag):
        b1._PALLAS_DEFAULT = flag
        return jax.tree.map(np.asarray, jax.jit(encode_frames)(x))

    p_x, p_p = at1_planes(False), at1_planes(True)
    b1._PALLAS_DEFAULT = False
    for k in p_x:
        assert np.array_equal(p_x[k], p_p[k]), f"AT1 plane {k}"
    print("AT1 planes identical")
    print("SMOKE PASS — run tools/perf_campaign.py next")


if __name__ == "__main__":
    main()
