"""ATRAC1 framed, windowed MDCT/IMDCT — batched over frames.

The reference chains 32-sample sine transitions through per-band scratch
buffers one frame at a time (reference: src/atrac1denc.cpp:70-137).  The
whole framing is linear in (previous frame's last 32 band samples, current
frame), so here it is folded into precomputed matrices and evaluated for all
frames at once; long and short window variants are both computed and selected
by the per-frame/band window mask (masked select instead of control flow).

Per-band conventions (atrac1denc.cpp:70-102):
  band 0 (low, 128 samples): long MDCT-256 (net scale 1/512), short 4xMDCT-64
  band 1 (mid, 128):        same, spectrum reversed per MDCT block
  band 2 (hi, 256):         long MDCT-512 (1/512), short 8xMDCT-64 with x2
                            level compensation, spectrum reversed per block
"""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from atracdenc_tpu.ops.mdct import _mdct_matrix_np
from . import tables as T

_SINE64 = np.sin((np.arange(32) + 0.5) * np.pi / 64.0)  # 32-pt transition

_BANDS = (
    # (bufsz, N_long, long_scale, winstart, short_scale)
    (128, 256, 0.5 / 256.0, 48, 0.5 / 64.0),
    (128, 256, 0.5 / 256.0, 48, 0.5 / 64.0),
    (256, 512, 1.0 / 512.0, 112, 1.0 / 64.0),  # x2 level comp folded in
)


@lru_cache(maxsize=None)
def _fwd_matrices(band: int):
    bufsz, n, lscale, winstart, sscale = _BANDS[band]
    m_long = _mdct_matrix_np(n)          # [n/2, n]
    m64 = _mdct_matrix_np(64)            # [32, 64]

    # Long: spec = prev32 @ A + frame @ B
    a = np.zeros((32, bufsz))
    for i in range(32):
        a[i] = lscale * _SINE64[i] * m_long[:, winstart + i]
    b = np.zeros((bufsz, bufsz))
    for j in range(bufsz):
        w = _SINE64[31 - (j - (bufsz - 32))] if j >= bufsz - 32 else 1.0
        b[j] = lscale * w * m_long[:, winstart + 32 + j]

    # Short: spec32 = prevblk32 @ R + blk32 @ F (fully sine-windowed 64-pt)
    r = np.zeros((32, 32))
    f = np.zeros((32, 32))
    for i in range(32):
        r[i] = sscale * _SINE64[i] * m64[:, i]
        f[i] = sscale * _SINE64[31 - i] * m64[:, 32 + i]
    cast = lambda x: np.asarray(x, np.float32)  # numpy: safe under jit retrace
    return cast(a), cast(b), cast(r), cast(f)


@lru_cache(maxsize=None)
def _inv_matrices(band: int):
    bufsz, n, _, _, _ = _BANDS[band]
    m_long = _mdct_matrix_np(n)
    m64 = _mdct_matrix_np(64)
    # inv = spec @ (2 * M); keep only the middle half [n/4, 3n/4)
    inv_long = 2.0 * m_long[:, n // 4: 3 * n // 4]   # [bufsz, bufsz]
    inv_short = 2.0 * m64[:, 16: 48]                 # [32, 32]
    return np.asarray(inv_long, np.float32), np.asarray(inv_short, np.float32)


def _dot(x, m):
    return jax.lax.dot_general(
        x, m, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=x.dtype)


def _reverse_blocks(spec, blk):
    """Reverse every `blk`-sized group along the last axis."""
    shape = spec.shape
    return spec.reshape(shape[:-1] + (-1, blk))[..., ::-1].reshape(shape)


def mdct_frames(band_frames, short_mask, band: int):
    """Windowed MDCT of one QMF band for all frames.

    band_frames: [..., nF, bufsz] band samples per frame
    short_mask:  [..., nF] bool — True where this band uses short windows
    Returns specs [..., nF, bufsz].
    """
    a, b, r, f = _fwd_matrices(band)
    bufsz = band_frames.shape[-1]
    nblk = bufsz // 32

    prev32 = jnp.concatenate(
        [jnp.zeros_like(band_frames[..., :1, -32:]), band_frames[..., :-1, -32:]],
        axis=-2)                                              # [..., nF, 32]

    spec_long = _dot(prev32, a) + _dot(band_frames, b)        # [..., nF, bufsz]

    blocks = band_frames.reshape(band_frames.shape[:-1] + (nblk, 32))
    prevblk = jnp.concatenate([prev32[..., None, :], blocks[..., :-1, :]], axis=-2)
    spec_short = (_dot(prevblk, r) + _dot(blocks, f)).reshape(band_frames.shape)

    if band > 0:
        spec_long = _reverse_blocks(spec_long, bufsz)
        spec_short = _reverse_blocks(spec_short, 32)

    return jnp.where(short_mask[..., None], spec_short, spec_long)


def imdct_frames(specs, short_mask, band: int):
    """Inverse of mdct_frames: specs [..., nF, bufsz] -> band samples.

    Implements the reference overlap-add (atrac1denc.cpp:103-137): 32-sample
    sine cross-fade at every MDCT block boundary, rectangular center for long
    blocks, with the 16-sample tail carried across frames (computed here per
    frame and shifted — no recurrence).
    """
    inv_long_m, inv_short_m = _inv_matrices(band)
    bufsz = specs.shape[-1]
    nblk = bufsz // 32
    sw = jnp.asarray(_SINE64, jnp.float32)

    spec_long = _reverse_blocks(specs, bufsz) if band > 0 else specs
    spec_short = _reverse_blocks(specs, 32) if band > 0 else specs

    # ---- long path ----
    invbuf = _dot(spec_long, inv_long_m)                      # [..., nF, bufsz]
    tail_long = invbuf[..., bufsz - 16:]                      # [..., nF, 16]

    # ---- short path ----
    blocks = spec_short.reshape(specs.shape[:-1] + (nblk, 32))
    invblk = _dot(blocks, inv_short_m)                        # [..., nF, nblk, 32]
    tail_short = invblk[..., -1, 16:]                         # [..., nF, 16]

    # previous frame's carried tail depends on ITS window mode
    tail = jnp.where(short_mask[..., None], tail_short, tail_long)
    prev_tail = jnp.concatenate(
        [jnp.zeros_like(tail[..., :1, :]), tail[..., :-1, :]], axis=-2)

    def overlap(tail16, head16):
        """32-sample sine cross-fade (vector_fmul_window, atrac1denc.cpp:51-68).

        tail16: [..., 16] previous tail; head16: [..., 16] current inv head.
        out[p]      = tail[p] * sw[31-p] - head[15-p] * sw[p]
        out[31 - p] = tail[p] * sw[p]    + head[15-p] * sw[31-p]
        """
        rev_head = head16[..., ::-1]
        first = tail16 * sw[31:15:-1] - rev_head * sw[:16]
        second = (tail16 * sw[:16] + rev_head * sw[31:15:-1])[..., ::-1]
        return jnp.concatenate([first, second], axis=-1)

    out_long = jnp.concatenate(
        [overlap(prev_tail, invbuf[..., :16]), invbuf[..., 16: bufsz - 16]], axis=-1)

    # short: chain overlaps through the frame's blocks
    heads = invblk[..., :16]                                  # [..., nF, nblk, 16]
    intra_tails = invblk[..., :-1, 16:]                       # blocks 0..nblk-2
    tails = jnp.concatenate([prev_tail[..., None, :], intra_tails], axis=-2)
    out_short = overlap(tails, heads).reshape(specs.shape)

    return jnp.where(short_mask[..., None], out_short, out_long)
