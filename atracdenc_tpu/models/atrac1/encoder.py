"""ATRAC1 encoder: whole-track, batched, jit-compiled.

Pipeline per channel (reference call stack: src/atrac1denc.cpp:180-255):
  QMF analysis -> per-band transient detection -> windowed MDCT ->
  loudness tracking (scan) -> block-floating scale -> bit allocation ->
  mantissa quantization.
The output is a set of fixed-shape integer planes; host code (frame.py)
serializes them into 212-byte sound units.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from atracdenc_tpu.ops import psy, scale as scale_ops
from atracdenc_tpu.ops.transient import transient_mask
from . import tables as T
from . import filterbank
from .mdct import mdct_frames
from .bitalloc import allocate

_LOUD_CURVE = jnp.asarray(psy.create_loudness_curve(T.NUM_SAMPLES))
_GATHER_LONG = jnp.asarray(T.GATHER_LONG)
_GATHER_SHORT = jnp.asarray(T.GATHER_SHORT)
_GATHER_MASK = jnp.asarray(T.GATHER_MASK)
_BFU_TO_BAND = jnp.asarray(T.BFU_TO_BAND)


def _invert_spectrum(x):
    """Negate even-indexed samples (util.h:51-63); frames are even-length so
    the per-frame pattern equals the whole-track pattern."""
    sign = jnp.where(jnp.arange(x.shape[-1]) % 2 == 0, -1.0, 1.0).astype(x.dtype)
    return x * sign


def _blocks_static(specs, start_tab):
    """[..., 512] -> [..., 52, 20] padded BFU blocks for one (static) line
    layout — every BFU's lines are a contiguous run, so this is a slice/pad
    composition, not a gather."""
    parts = []
    for b in range(T.MAX_BFUS):
        s = int(start_tab[b, 0])
        n = int(T.SPECS_PER_BLOCK[b])
        parts.append(jnp.pad(specs[..., s:s + n],
                             [(0, 0)] * (specs.ndim - 1) + [(0, 20 - n)]))
    return jnp.stack(parts, axis=-2)


def gather_bfu_blocks(specs, short_flags):
    """[..., 512] spectra -> padded BFU blocks [..., 52, 20].

    short_flags: [..., 3] bool per band; selects short/long line layout
    (atrac_scale.cpp:175-188).  Both layouts are static slice compositions;
    the per-BFU choice is a select (TPU gathers here cost ~600 ms/batch).
    """
    long_b = _blocks_static(specs, T.GATHER_LONG)
    short_b = _blocks_static(specs, T.GATHER_SHORT)
    short_per_bfu = sum(
        short_flags[..., band, None] * (np.asarray(T.BFU_TO_BAND) == band)
        for band in range(3))                         # [..., 52] bool-ish
    return jnp.where(short_per_bfu[..., None].astype(bool),
                     short_b, long_b) * _GATHER_MASK


@partial(jax.jit, static_argnames=("bfu_idx_const", "window_mode", "window_mask"))
def encode_frames(pcm, bfu_idx_const=0, window_mode="auto", window_mask=0):
    """Encode [C, T] PCM (T multiple of 512) into ATRAC1 frame planes.

    Returns dict of planes:
      short_mask [C, F, 3] bool, bfu_idx [C, F], wordlen [C, F, 52],
      sfi [C, F, 52], mant [C, F, 52, 20] — all int32/bool.
    """
    c, t = pcm.shape
    f = t // T.NUM_SAMPLES

    low, mid, hi = filterbank.analysis(pcm)

    if window_mode == "auto":
        m_low = transient_mask(low, 128)
        m_mid = transient_mask(_invert_spectrum(mid), 128)
        m_hi = transient_mask(_invert_spectrum(hi), 256)
        masks = jnp.stack([m_low, m_mid, m_hi], axis=-1)      # [C, F, 3]
    else:
        masks = jnp.broadcast_to(
            jnp.asarray([bool(window_mask & 1), bool(window_mask & 2),
                         bool(window_mask & 4)]), (c, f, 3))

    specs = jnp.concatenate([
        mdct_frames(low.reshape(c, f, 128), masks[..., 0], 0),
        mdct_frames(mid.reshape(c, f, 128), masks[..., 1], 1),
        mdct_frames(hi.reshape(c, f, 256), masks[..., 2], 2),
    ], axis=-1)                                               # [C, F, 512]

    # loudness IIR across frames (atrac1denc.cpp:235-247)
    frame_loud = jnp.sum(specs * specs * _LOUD_CURVE, axis=-1)  # [C, F]
    mask_any = jnp.any(masks, axis=-1)                          # [C, F]
    if c == 2:
        use_both = ~mask_any[0] & ~mask_any[1]
        use_one = ~mask_any[0] & ~use_both
        l0, l1 = frame_loud[0], frame_loud[1]
    else:
        use_both = jnp.zeros((f,), bool)
        use_one = ~mask_any[0]
        l0 = frame_loud[0]
        l1 = jnp.zeros_like(l0)
    loud = psy.track_loudness_scan(l0, l1, use_both, use_one, T.LOUD_FACTOR)
    loud = jnp.broadcast_to(loud / T.LOUD_FACTOR, (c, f))

    blocks = gather_bfu_blocks(specs, masks)                  # [C, F, 52, 20]
    sfi, scaled, energy = scale_ops.scale_blocks(
        blocks, _GATHER_MASK, jnp.asarray(T.SCALE_TABLE))

    bfu_idx, wordlen = allocate(sfi, energy, masks, loud,
                                bfu_idx_const=bfu_idx_const)
    mant = scale_ops.quant_mantissas(scaled, wordlen)

    return {
        "short_mask": masks,
        "bfu_idx": bfu_idx.astype(jnp.int32),
        "wordlen": wordlen,
        "sfi": sfi,
        "mant": mant,
    }


def encode_track(pcm: np.ndarray, bfu_idx_const: int = 0,
                 window_mode: str = "auto", window_mask: int = 0):
    """NumPy convenience wrapper: pads to a whole number of frames."""
    pcm = np.atleast_2d(np.asarray(pcm, np.float32))
    c, t = pcm.shape
    pad = (-t) % T.NUM_SAMPLES
    if pad:
        pcm = np.pad(pcm, ((0, 0), (0, pad)))
    planes = encode_frames(jnp.asarray(pcm), bfu_idx_const=bfu_idx_const,
                           window_mode=window_mode, window_mask=window_mask)
    return {k: np.asarray(v) for k, v in planes.items()}
