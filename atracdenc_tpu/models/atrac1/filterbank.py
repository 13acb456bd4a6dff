"""ATRAC1 three-band analysis/synthesis filterbank over a whole track.

Tree of two QMF stages (reference: src/atrac/at1/atrac1_qmf.h:25-64):
  512 PCM -> QMF1 -> (midlow 256, hi 256) ; hi delayed 39 band samples
  midlow  -> QMF2 -> (low 128, mid 128)
Expressed here as whole-track convolutions (see ops/qmf.py); the 39-sample
delay-compensation line becomes a static shift.
"""
import jax.numpy as jnp

from atracdenc_tpu.ops.qmf import qmf_analysis, qmf_synthesis

DELAY_COMP = 39  # hi-band alignment delay, in band samples (atrac1_qmf.h:27)


def _delay(x, n):
    """Delay the last axis by n samples, zero-filled (causal)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(n, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def analysis(pcm):
    """[..., T] PCM -> (low [T/4], mid [T/4], hi [T/2]) band signals."""
    midlow, hi = qmf_analysis(pcm)
    low, mid = qmf_analysis(midlow)
    return low, mid, _delay(hi, DELAY_COMP)


def synthesis(low, mid, hi):
    """(low, mid, hi) -> [..., T] PCM (delays mirror the analysis tree)."""
    midlow = qmf_synthesis(low, mid)
    return qmf_synthesis(midlow, _delay(hi, DELAY_COMP))
