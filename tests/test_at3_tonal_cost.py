"""The closed-form tonal dry-run cost must equal the sequential-automaton
oracle for every allocation (tonal.make_cost_fn vs make_cost_fn_scan).

The closed form replaces the GroupTonalComponents subgroup walk
(atrac3_bitstream.cpp:453-595) with pairwise predicates; these tests sweep
randomized block layouts, including the adversarial shapes the derivation
leans on: >=8 same-bucket blocks inside one 64-line anchor group (limiter
breaks), window transitions, and num_bfu shrink masking.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from atracdenc_tpu.models.atrac3 import tonal


def _planes_from(rng, dense=False):
    """Random-but-wire-plausible tonal block planes for a [C, F] batch."""
    c, f, nb = 2, 5, 32
    nact = rng.integers(0, 22 if not dense else 22, size=(c, f))
    active = np.zeros((c, f, nb), bool)
    start = np.zeros((c, f, nb), np.int32)
    ln = np.zeros((c, f, nb), np.int32)
    bfu = np.zeros((c, f, nb), np.int32)
    for ci in range(c):
        for fi in range(f):
            k = int(nact[ci, fi])
            if dense:
                # many blocks packed into one 64-line window with few
                # lengths -> same-bucket clusters of size >= 8
                lens = rng.integers(1, 3, size=k)
                positions = np.cumsum(lens) - lens[0] + 256
            else:
                lens = rng.integers(1, 8, size=k)
                gaps = rng.integers(1, 60, size=k)
                positions = np.cumsum(lens + gaps) + 8 * 32
            positions = np.clip(positions, 0, 1023)
            order = np.argsort(positions, kind="stable")
            active[ci, fi, :k] = True
            start[ci, fi, :k] = positions[order]
            ln[ci, fi, :k] = lens[order]
            bfu[ci, fi, :k] = np.sort(rng.integers(8, 30, size=k))
    vlc = rng.integers(4, 60, size=(c, f, nb, 8)).astype(np.int32)
    return {
        "active": jnp.asarray(active), "start": jnp.asarray(start),
        "len": jnp.asarray(ln), "bfu": jnp.asarray(bfu),
        "vlc_cost": jnp.asarray(vlc),
    }


@pytest.mark.parametrize("dense", [False, True])
def test_closed_form_matches_scan_oracle(dense):
    rng = np.random.default_rng(7 if dense else 3)
    for trial in range(6):
        planes = _planes_from(rng, dense=dense)
        fast = tonal.make_cost_fn(planes)
        slow = tonal.make_cost_fn_scan(planes)
        c, f = planes["active"].shape[:2]
        for _ in range(4):
            wl = jnp.asarray(rng.integers(0, 8, size=(c, f, 32)), jnp.int32)
            num_bfu = jnp.asarray(rng.integers(1, 33, size=(c, f)), jnp.int32)
            a = np.asarray(fast(wl, num_bfu))
            b = np.asarray(slow(wl, num_bfu))
            assert np.array_equal(a, b), (
                f"trial {trial}: closed form diverges from automaton "
                f"(max diff {np.abs(a - b).max()})")


def test_single_bucket_limiter_breaks():
    """>= 8 blocks of one bucket inside one 64-aligned group: the limiter
    must open a new subgroup at members 8, 15, ... (cnt = 1 mod 7)."""
    nb = 32
    k = 17
    planes = {
        "active": jnp.asarray(np.arange(nb) < k),
        "start": jnp.asarray(np.where(np.arange(nb) < k,
                                      256 + np.arange(nb) * 3, 0)
                             ).astype(jnp.int32),
        "len": jnp.asarray(np.where(np.arange(nb) < k, 2, 0)),
        "bfu": jnp.full((nb,), 10, jnp.int32),
        "vlc_cost": jnp.full((nb, 8), 10, jnp.int32),
    }
    # start positions 256..304 (one 64-group) then 307.. (next group)
    wl = jnp.full((32,), 1, jnp.int32)
    num_bfu = jnp.asarray(32, jnp.int32)
    fast = tonal.make_cost_fn(planes)(wl, num_bfu)
    slow = tonal.make_cost_fn_scan(planes)(wl, num_bfu)
    assert int(fast) == int(slow)
