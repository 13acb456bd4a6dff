"""Bit packer tests: native C++ and NumPy implementations must agree."""
import numpy as np
import pytest

from atracdenc_tpu.utils import bitpack, native


def _random_fields(rng, f=64, k=100):
    widths = rng.integers(0, 17, (f, k)).astype(np.int64)
    widths[rng.random((f, k)) < 0.3] = 0
    values = rng.integers(0, 1 << 16, (f, k)).astype(np.uint32)
    values &= (1 << np.maximum(widths, 1)).astype(np.uint32) - 1
    values = np.where(widths > 0, values, 0).astype(np.uint32)
    # keep within a 212-byte frame
    while np.any(widths.sum(1) > 212 * 8):
        widths[widths.sum(1) > 212 * 8, -10:] = 0
    return values, widths


def test_pack_unpack_roundtrip_numpy():
    rng = np.random.default_rng(3)
    values, widths = _random_fields(rng)
    frames = bitpack._pack_frames_np(values, widths, 212)
    offsets = np.zeros_like(widths)
    np.cumsum(widths[:, :-1], axis=1, out=offsets[:, 1:])
    bits = np.unpackbits(frames, axis=1)
    back = bitpack.unpack_fields(bits, offsets, widths)
    np.testing.assert_array_equal(back, values)


def test_native_matches_numpy():
    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    values, widths = _random_fields(rng)
    ref = bitpack._pack_frames_np(values, widths, 212)
    nat = native.pack_frames(values, widths, 212)
    np.testing.assert_array_equal(nat, ref)

    offsets = np.zeros_like(widths)
    np.cumsum(widths[:, :-1], axis=1, out=offsets[:, 1:])
    got = native.unpack_fields(ref, offsets, widths)
    np.testing.assert_array_equal(got, values)


def test_make_mask_sign_inverse():
    rng = np.random.default_rng(5)
    w = rng.integers(2, 17, 1000)
    v = rng.integers(-(1 << 15), 1 << 15, 1000)
    v = np.clip(v, -(1 << (w - 1)) + 1, (1 << (w - 1)) - 1)
    masked = bitpack.mask_sign(v, w)
    back = bitpack.make_sign(masked, w)
    np.testing.assert_array_equal(back, v)
