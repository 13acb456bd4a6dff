"""ATRAC1 decoder: frame planes -> PCM, whole-track and batched.

Mirrors the reference decode path (src/atrac1denc.cpp:139-177): dequantize ->
windowed IMDCT with overlap-add -> QMF synthesis -> clip to [-1, 1].
Malformed frames are pre-substituted by the parser (frame.py) with silent
planes and a neutral (long) window mode, preserving overlap/QMF state exactly
like the reference (atrac1denc.cpp:151-162).
"""
import jax
import jax.numpy as jnp
import numpy as np

from . import tables as T
from . import filterbank
from .mdct import imdct_frames
from .encoder import _GATHER_LONG, _GATHER_SHORT, _GATHER_MASK, _BFU_TO_BAND


@jax.jit
def decode_frames(short_mask, wordlen, sfi, mant):
    """Planes -> PCM [C, F*512].

    short_mask [C, F, 3] bool; wordlen/sfi [C, F, 52]; mant [C, F, 52, 20].
    """
    c, f, _ = wordlen.shape

    # dequantize (atrac1_dequantiser.cpp:31-68)
    scale_tab = jnp.asarray(T.SCALE_TABLE)
    max_quant = 1.0 / (jnp.left_shift(1, jnp.maximum(wordlen, 2) - 1) - 1
                       ).astype(jnp.float32)
    vals = (scale_tab[sfi] * max_quant)[..., None] * mant.astype(jnp.float32)
    vals = jnp.where((wordlen >= 2)[..., None], vals, 0.0) * _GATHER_MASK

    # scatter padded blocks into [C, F, 512] spectra
    short_per_bfu = jnp.take_along_axis(
        short_mask, jnp.broadcast_to(_BFU_TO_BAND, (c, f, T.MAX_BFUS)), axis=-1)
    idx = jnp.where(short_per_bfu[..., None], _GATHER_SHORT, _GATHER_LONG)
    # padding lanes scatter out-of-range and are dropped
    idx = jnp.where(_GATHER_MASK, idx, 512)
    flat_idx = idx.reshape(c, f, -1)
    flat_vals = vals.reshape(c, f, -1)
    specs = jnp.zeros((c, f, 512), jnp.float32)
    specs = jax.vmap(jax.vmap(lambda s, i, v: s.at[i].set(v, mode="drop")))(
        specs, flat_idx, flat_vals)

    low = imdct_frames(specs[..., 0:128], short_mask[..., 0], 0).reshape(c, -1)
    mid = imdct_frames(specs[..., 128:256], short_mask[..., 1], 1).reshape(c, -1)
    hi = imdct_frames(specs[..., 256:512], short_mask[..., 2], 2).reshape(c, -1)

    pcm = filterbank.synthesis(low, mid, hi)
    return jnp.clip(pcm, -1.0, 1.0)


def decode_track(planes) -> np.ndarray:
    return np.asarray(decode_frames(
        jnp.asarray(planes["short_mask"]), jnp.asarray(planes["wordlen"]),
        jnp.asarray(planes["sfi"]), jnp.asarray(planes["mant"])))
