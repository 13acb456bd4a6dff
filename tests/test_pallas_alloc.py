"""Fused rate-control Pallas kernel == the XLA bisection, bit for bit.

The kernel (ops/pallas_alloc.py) re-runs bitalloc's lambda bisection —
CalcBitsAllocation, the ConsiderEnergyErr boost fixed point, spec-bit
costing and the tonal subgroup walk — entirely in VMEM.  Every float op is
the same IEEE f32 elementwise op as the XLA path (the log2 is precomputed
outside), so the final wordlens must be IDENTICAL, not just close.
Runs in interpreter mode on the CPU mesh.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from atracdenc_tpu.models.atrac3 import bitalloc, tables as T, tonal
from atracdenc_tpu.models.atrac3.encoder import (_GATHER_MASK,
                                                 gather_bfu_blocks,
                                                 spread_from_sfi)
from atracdenc_tpu.ops import scale as scale_ops


def _random_case(seed, c=2, f=6, with_tonal=True):
    rng = np.random.default_rng(seed)
    specs = (rng.standard_normal((c, f, 1024))
             * 10.0 ** rng.uniform(-4, 0, (c, f, 1))).astype(np.float32)
    specs = jnp.asarray(specs)
    if with_tonal:
        flat = tonal.flatness_per_bfu(specs * specs)
        # force a few flat BFUs so tonal blocks actually appear
        specs2, tp = tonal.extract(specs, flat)
        planes = tonal.scale_groups(tp)
        bfu_oh = np.eye(32, dtype=np.int32)[np.asarray(planes["bfu"])]
        counts = jnp.asarray(
            (bfu_oh * np.asarray(planes["active"])[..., None]).sum(-2))
        fn = tonal.make_cost_fn(planes)
    else:
        specs2, planes, counts, fn = specs, None, None, None

    blocks = gather_bfu_blocks(specs2)
    sfi, scaled, energy = scale_ops.scale_blocks(
        blocks, _GATHER_MASK, jnp.asarray(T.SCALE_TABLE))
    qt = bitalloc.quant_tensors(scaled, _GATHER_MASK)
    spread = spread_from_sfi(sfi)
    gsf = jnp.asarray(
        10.0 ** rng.uniform(-0.3, 0.3, (c, f, 4)).astype(np.float32))
    loud = jnp.asarray(
        10.0 ** rng.uniform(-3, 0, (c, f)).astype(np.float32))
    target = jnp.asarray(
        rng.integers(300, 1600, (c, f)).astype(np.int32))
    return qt, sfi, gsf, energy, spread, loud, target, counts, fn, planes


@pytest.mark.parametrize("with_tonal", [False, True])
def test_fused_bisect_equals_xla(with_tonal):
    for seed in (0, 1):
        (qt, sfi, gsf, energy, spread, loud, target,
         counts, fn, planes) = _random_case(seed, with_tonal=with_tonal)
        nb_x, mode_x, wl_x = bitalloc.allocate(
            qt, sfi, gsf, energy, spread, loud, target,
            tonal_counts=counts, tonal_bits_fn=fn, use_pallas=False)
        nb_p, mode_p, wl_p = bitalloc.allocate(
            qt, sfi, gsf, energy, spread, loud, target,
            tonal_counts=counts, tonal_bits_fn=fn, tonal_planes=planes,
            use_pallas=True)
        assert np.array_equal(np.asarray(nb_x), np.asarray(nb_p))
        assert np.array_equal(np.asarray(wl_x), np.asarray(wl_p))
        assert np.array_equal(np.asarray(mode_x), np.asarray(mode_p))


def test_fused_bisect_under_vmap():
    """The batch-transcode path vmaps the encoder over streams, so the
    kernel must batch through jax.vmap (Pallas adds a grid dim)."""
    import jax

    cases = [_random_case(s, c=1, f=4, with_tonal=False) for s in (0, 1)]
    qt = {k: jnp.stack([c[0][k] for c in cases]) for k in cases[0][0]}
    stack = lambda i: jnp.stack([c[i] for c in cases])
    sfi, gsf, energy, spread, loud, target = (
        stack(1), stack(2), stack(3), stack(4), stack(5), stack(6))

    def run(up):
        return jax.vmap(lambda qt, s, g, e, sp, l, t: bitalloc.allocate(
            qt, s, g, e, sp, l, t, use_pallas=up))(
                qt, sfi, gsf, energy, spread, loud, target)

    nb_x, mode_x, wl_x = run(False)
    nb_p, mode_p, wl_p = run(True)
    assert np.array_equal(np.asarray(nb_x), np.asarray(nb_p))
    assert np.array_equal(np.asarray(wl_x), np.asarray(wl_p))
    assert np.array_equal(np.asarray(mode_x), np.asarray(mode_p))


def test_at1_fused_allocate_equals_xla():
    """ATRAC1 fused rate control (bisect + shrink + booster) == XLA."""
    from atracdenc_tpu.models.atrac1 import bitalloc as ba1, tables as T1

    rng = np.random.default_rng(3)
    c, f = 2, 8
    sfi = jnp.asarray(rng.integers(0, 64, (c, f, 52)).astype(np.int32))
    energy = jnp.asarray(
        (10.0 ** rng.uniform(-9, 2, (c, f, 52))).astype(np.float32))
    short_flags = jnp.asarray(rng.integers(0, 2, (c, f, 3)) > 0)
    loud = jnp.asarray(
        (10.0 ** rng.uniform(-4, 0, (c, f))).astype(np.float32))

    for const in (0, 1, 4):
        idx_x, wl_x = ba1.allocate(sfi, energy, short_flags, loud,
                                   bfu_idx_const=const, use_pallas=False)
        idx_p, wl_p = ba1.allocate(sfi, energy, short_flags, loud,
                                   bfu_idx_const=const, use_pallas=True)
        assert np.array_equal(np.asarray(idx_x), np.asarray(idx_p)), const
        assert np.array_equal(np.asarray(wl_x), np.asarray(wl_p)), const


def test_fused_bisect_dense_tonal_limiter_breaks():
    """Dense same-bucket tonal planes (>= 8 blocks in one 64-line anchor
    group) drive the kernel's limiter-break ranks (cnt == 8, 15) — the brk
    branch randomly extracted planes almost never reach.  Must equal the
    XLA closed form bit for bit."""
    (qt, sfi, gsf, energy, spread, loud, target,
     _c, _f, _p) = _random_case(11, with_tonal=False)
    c, f = sfi.shape[:2]
    rng = np.random.default_rng(11)
    nb = 32
    k = 18                       # one bucket, one 64-group: ranks 8 and 15
    act = np.zeros((c, f, nb), bool)
    start = np.zeros((c, f, nb), np.int32)
    ln = np.zeros((c, f, nb), np.int32)
    bfu = np.zeros((c, f, nb), np.int32)
    act[..., :k] = True
    start[..., :k] = 256 + np.arange(k) * 3   # all inside pos>>6 == 4
    ln[..., :k] = 2
    bfu[..., :k] = 10                         # same wl -> same quant bucket
    planes = {
        "active": jnp.asarray(act), "start": jnp.asarray(start),
        "len": jnp.asarray(ln), "bfu": jnp.asarray(bfu),
        "vlc_cost": jnp.asarray(
            rng.integers(4, 60, size=(c, f, nb, 8)).astype(np.int32)),
    }
    counts = jnp.asarray(
        (np.eye(32, dtype=np.int32)[np.asarray(planes["bfu"])]
         * np.asarray(planes["active"])[..., None]).sum(-2))
    fn = tonal.make_cost_fn(planes)
    nb_x, mode_x, wl_x = bitalloc.allocate(
        qt, sfi, gsf, energy, spread, loud, target,
        tonal_counts=counts, tonal_bits_fn=fn, use_pallas=False)
    nb_p, mode_p, wl_p = bitalloc.allocate(
        qt, sfi, gsf, energy, spread, loud, target,
        tonal_counts=counts, tonal_bits_fn=fn, tonal_planes=planes,
        use_pallas=True)
    assert np.array_equal(np.asarray(nb_x), np.asarray(nb_p))
    assert np.array_equal(np.asarray(wl_x), np.asarray(wl_p))
    assert np.array_equal(np.asarray(mode_x), np.asarray(mode_p))


def test_fused_bisect_low_budget_shrink():
    """Tiny targets exercise the num_bfu clamp + shrink Repeat rounds."""
    (qt, sfi, gsf, energy, spread, loud, _target,
     counts, fn, planes) = _random_case(7, with_tonal=True)
    target = jnp.asarray(
        np.random.default_rng(7).integers(40, 220, _target.shape)
        .astype(np.int32))
    nb_x, mode_x, wl_x = bitalloc.allocate(
        qt, sfi, gsf, energy, spread, loud, target,
        tonal_counts=counts, tonal_bits_fn=fn, use_pallas=False)
    nb_p, mode_p, wl_p = bitalloc.allocate(
        qt, sfi, gsf, energy, spread, loud, target,
        tonal_counts=counts, tonal_bits_fn=fn, tonal_planes=planes,
        use_pallas=True)
    assert np.array_equal(np.asarray(nb_x), np.asarray(nb_p))
    assert np.array_equal(np.asarray(wl_x), np.asarray(wl_p))
    assert np.array_equal(np.asarray(mode_x), np.asarray(mode_p))
