"""ATRAC1 sound-unit serialization ON DEVICE.

jnp counterpart of frame.pack: same field planes (the AT1 layout has no
data-dependent interleave, so offsets are a plain prefix sum) deposited into
212-byte units by ops/bitdeposit.deposit_fields.  Byte-identical to the host
path (tests/test_at3_device_pack.py).  Layout per the reference writer
(atrac1_bitalloc.cpp:279-327).
"""
import jax
import jax.numpy as jnp
import numpy as np

from atracdenc_tpu.ops.bitdeposit import deposit_fields
from . import tables as T

_N_HEADER = 7
_HEADER_WIDTHS = np.array([2, 2, 2, 2, 3, 2, 3], np.int32)
_MAXLEN = 20


def _mask_sign(v, w):
    return (v.astype(jnp.int64) & ((1 << w.astype(jnp.int64)) - 1)) \
        .astype(jnp.uint32)


@jax.jit
def pack_device(planes):
    """planes (single merged channel axis, like frame.pack) -> [N, 212]."""
    short = planes["short_mask"].astype(bool)
    bfu_idx = planes["bfu_idx"].astype(jnp.int32)
    wl = planes["wordlen"].astype(jnp.int32)
    sfi = planes["sfi"].astype(jnp.int32)
    mant = planes["mant"].astype(jnp.int32)
    n = bfu_idx.shape[0]
    bfu_num = jnp.asarray(T.BFU_AMOUNT_TAB)[bfu_idx]
    in_use = jnp.arange(52)[None, :] < bfu_num[:, None]

    head_v = jnp.stack([
        jnp.where(short[:, 0], 0, 2), jnp.where(short[:, 1], 0, 2),
        jnp.where(short[:, 2], 0, 3), jnp.zeros((n,), jnp.int32),
        bfu_idx, jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
    ], axis=1).astype(jnp.uint32)
    head_w = jnp.broadcast_to(jnp.asarray(_HEADER_WIDTHS), (n, _N_HEADER))

    wl_v = jnp.where(wl > 0, wl - 1, 0).astype(jnp.uint32)
    wl_w = jnp.where(in_use, 4, 0)
    sfi_w = jnp.where(in_use, 6, 0)

    spec_valid = jnp.asarray(T.GATHER_MASK)[None]
    mant_w = jnp.where(spec_valid & (wl >= 2)[:, :, None]
                       & in_use[:, :, None], wl[:, :, None], 0)
    mant_v = _mask_sign(mant, jnp.maximum(mant_w, 1))

    values = jnp.concatenate(
        [head_v, wl_v, sfi.astype(jnp.uint32), mant_v.reshape(n, -1)], 1)
    widths = jnp.concatenate(
        [head_w, wl_w, sfi_w, mant_w.reshape(n, -1)], 1).astype(jnp.int32)
    offsets = jnp.cumsum(widths, -1) - widths
    return deposit_fields(values, widths, offsets, T.SOUND_UNIT_SIZE)
