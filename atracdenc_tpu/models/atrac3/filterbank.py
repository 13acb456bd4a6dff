"""ATRAC3 four-band analysis/synthesis filterbank over a whole track.

Tree of three QMF stages (reference: src/atrac/at3/atrac3_qmf.h:24-42):
  1024 PCM -> QMF1 -> (lower 512, upper 512)
  lower    -> QMF2 -> (subs[0], subs[1])
  upper    -> QMF3 -> (subs[3], subs[2])   # note the band-order flip
The reference has no synthesis bank (encoder-only); the inverse here is a new
capability used by our QA decoder.
"""
import jax.numpy as jnp

from atracdenc_tpu.ops.qmf import qmf_analysis, qmf_synthesis


def analysis(pcm):
    """[..., T] PCM -> [..., 4, T/4] band samples (T multiple of 1024)."""
    lower, upper = qmf_analysis(pcm)
    s0, s1 = qmf_analysis(lower)
    s3, s2 = qmf_analysis(upper)
    return jnp.stack([s0, s1, s2, s3], axis=-2)


def synthesis(bands):
    """[..., 4, M] band samples -> [..., 4M] PCM.

    Mirrors the analysis tree; output is delayed 3*46 = 138 samples relative
    to the analysis input (two cascaded QMF pairs, inner stage at half rate).
    """
    lower = qmf_synthesis(bands[..., 0, :], bands[..., 1, :])
    upper = qmf_synthesis(bands[..., 3, :], bands[..., 2, :])
    return qmf_synthesis(lower, upper)
