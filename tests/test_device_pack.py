"""On-device serialization vs the host packer (byte-identity).

deposit_fields is the generic arbitrary-offset bit depositor; the AT3/AT1
device packers must produce byte-identical frames to the host path
(frame.pack) for any planes, including tonal-section edge cases: multiple
(quant,len) buckets, 64-line-window straddling, and the 7-limiter subgroup
split (GroupTonalComponents, atrac3_bitstream.cpp:427-449).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from atracdenc_tpu.ops.bitdeposit import deposit_fields
from atracdenc_tpu.utils.bitpack import _pack_frames_np


def test_deposit_fields_random_vs_host():
    rng = np.random.default_rng(0)
    f, k, nbytes = 11, 257, 212
    widths = rng.integers(0, 15, (f, k)).astype(np.int32)
    widths[rng.random((f, k)) < 0.3] = 0
    values = (rng.integers(0, 1 << 24, (f, k))
              & ((1 << widths.astype(np.int64)) - 1)).astype(np.uint32)
    offsets = np.zeros((f, k), np.int64)
    np.cumsum(widths[:, :-1], axis=1, out=offsets[:, 1:])
    ref = _pack_frames_np(values, widths, nbytes)
    dev = np.asarray(deposit_fields(
        jnp.asarray(values), jnp.asarray(widths),
        jnp.asarray(offsets.astype(np.int32)), nbytes))
    assert (ref == dev).all()
    # field order must not matter (offsets are explicit)
    perm = rng.permutation(k)
    dev2 = np.asarray(deposit_fields(
        jnp.asarray(values[:, perm]), jnp.asarray(widths[:, perm]),
        jnp.asarray(offsets[:, perm].astype(np.int32)), nbytes))
    assert (ref == dev2).all()


def _at3_planes(rng, n, with_tonal):
    planes = {
        "num_bfu": rng.integers(10, 33, (2, n)).astype(np.int32),
        "coding_mode": rng.integers(0, 2, (2, n)).astype(np.int32),
        "wordlen": rng.integers(0, 8, (2, n, 32)).astype(np.int32),
        "sfi": rng.integers(0, 64, (2, n, 32)).astype(np.int32),
        "gain_npoints": rng.integers(0, 5, (2, n, 4)).astype(np.int32),
        "gain_levels": rng.integers(0, 16, (2, n, 4, 8)).astype(np.int32),
        "gain_locs": rng.integers(0, 32, (2, n, 4, 8)).astype(np.int32),
        "ms_shift": rng.integers(-8, 9, (n,)).astype(np.int32),
    }
    from atracdenc_tpu.models.atrac3 import tables as T
    wl = planes["wordlen"]
    maxq = np.array([0, 1, 2, 2, 3, 7, 15, 31])[wl]
    mant = rng.integers(-31, 32, (2, n, 32, 128))
    planes["mant"] = np.clip(mant, -maxq[..., None],
                             maxq[..., None]).astype(np.int32)
    if with_tonal:
        act = rng.random((2, n, 32)) < 0.5
        ln = rng.integers(1, 8, (2, n, 32))
        quant = rng.integers(1, 8, (2, n, 32))
        # positions ascend with BFU (as MapTonalComponents produces; the
        # writer's window walk relies on it) and lie in each BFU's range;
        # low BFUs share 64-line windows, exercising the 7-limiter
        room = np.maximum(T.SPECS_PER_BLOCK[None, None, :] - ln, 1)
        start = (T.SPECS_START[None, None, :]
                 + rng.integers(0, 1 << 30, (2, n, 32)) % room)
        # same (quant,len) for the low BFUs: one big bucket in window 0
        quant[..., :10] = quant[..., :1]
        ln[..., :10] = ln[..., :1]
        maxtq = np.array([0, 1, 2, 3, 4, 7, 15, 31])[quant]
        tm = rng.integers(-31, 32, (2, n, 32, 7))
        planes["tonal_active"] = act
        planes["tonal_len"] = ln.astype(np.int32)
        planes["tonal_quant"] = quant.astype(np.int32)
        planes["tonal_start"] = start.astype(np.int16)
        planes["tonal_sfi"] = rng.integers(0, 64, (2, n, 32)).astype(np.int32)
        planes["tonal_mant"] = np.clip(
            tm, -maxtq[..., None], maxtq[..., None]).astype(np.int32)
    return planes


@pytest.mark.parametrize("js,with_tonal", [(False, False), (False, True),
                                           (True, True)])
def test_at3_pack_device_byte_identity(js, with_tonal):
    from atracdenc_tpu.models.atrac3 import frame as at3_frame
    from atracdenc_tpu.models.atrac3.device_pack import pack_device

    rng = np.random.default_rng(7)
    planes = _at3_planes(rng, 9, with_tonal)
    ref = at3_frame.pack(planes, 384, js=js)
    dev = np.asarray(pack_device(
        {k: jnp.asarray(v) for k, v in planes.items()}, 384, js=js))
    assert (ref == dev).all(), int((ref != dev).sum())


def test_at1_pack_device_byte_identity():
    from atracdenc_tpu.models.atrac1 import frame as at1_frame
    from atracdenc_tpu.models.atrac1 import tables as T1
    from atracdenc_tpu.models.atrac1.device_pack import pack_device

    rng = np.random.default_rng(3)
    n = 17
    # keep total bits under the 212-byte unit (real allocations always do)
    wl = np.where(rng.random((n, 52)) < 0.3,
                  rng.integers(2, 4, (n, 52)), 0).astype(np.int32)
    mant = rng.integers(-1000, 1000, (n, 52, 20))
    lim = np.where(wl >= 2, (1 << np.maximum(wl - 1, 1)) - 1, 0)
    planes = {
        "short_mask": rng.random((n, 3)) < 0.3,
        "bfu_idx": rng.integers(0, 8, (n,)).astype(np.int32),
        "wordlen": wl,
        "sfi": rng.integers(0, 64, (n, 52)).astype(np.int32),
        "mant": np.clip(mant, -lim[..., None], lim[..., None]).astype(
            np.int32),
    }
    ref = at1_frame.pack(planes)
    dev = np.asarray(pack_device({k: jnp.asarray(v)
                                  for k, v in planes.items()}))
    assert (ref == dev).all(), int((ref != dev).sum())
