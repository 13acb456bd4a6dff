"""ATRAC1-style transient detection over a whole track.

The reference detects transients per frame with a 21-tap HPF FIR, per-16-
sample RMS in dB, and attack/release thresholds, carrying the last block's
level across frames (reference: src/transient_detector.cpp:52-93,
src/transient_detector.h:30-50).  Here the whole band signal is filtered with
one convolution and the carried level becomes a one-block shift — fully
batched, no recurrence.

Note on edge semantics: the reference's block-local filter never sees the
next block's first sample for the final in-block position (its scratch buffer
slot stays zero); the tap weight there is ~1e-17 so this formulation (a plain
convolution over the track) is equivalent to within denormal noise.
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hpf", "transient_mask"]

# 10 half-taps of the 21-tap symmetric HPF (transient_detector.cpp:52-57;
# the *2.0 is part of the table there).
_FIRCOEF = np.array([
    -8.65163e-18, -0.00851586, -6.74764e-18, 0.0209036,
    -3.36639e-17, -0.0438162, -1.54175e-17, 0.0931738,
    -5.52212e-17, -0.313819,
], dtype=np.float64) * 2.0


def _hpf_kernel():
    """22-tap kernel h with out[t] = sum_k h[k] * x[t + k - 20] / 2."""
    h = np.zeros(22, dtype=np.float64)
    h[10] = 1.0
    for j in range(10):
        h[j] = _FIRCOEF[j]
        h[21 - j] = _FIRCOEF[j]
    return (h / 2.0).astype(np.float32)


def hpf(x: jax.Array) -> jax.Array:
    """High-pass filter a [..., T] band signal (zero initial history)."""
    h = _hpf_kernel()
    batch = x.shape[:-1]
    lhs = x.reshape((-1, 1, x.shape[-1]))
    rhs = jnp.asarray(h).reshape((1, 1, -1))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(20, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(batch + (x.shape[-1],))


def transient_mask(band: jax.Array, frame_sz: int, short_sz: int = 16) -> jax.Array:
    """Per-frame transient flags for a [..., T] band signal.

    Returns bool [..., T // frame_sz].  Attack: level rise > 16 dB between
    adjacent 16-sample blocks; release: drop > 20 dB — including across the
    frame boundary via the carried previous level (initially 0 dB).
    """
    filtered = hpf(band)
    t = band.shape[-1]
    nblk = t // short_sz
    sq = filtered.reshape(band.shape[:-1] + (nblk, short_sz))
    rms = jnp.sqrt(jnp.mean(sq * sq, axis=-1))
    db = 19.0 * jnp.log10(rms)  # -inf for silent blocks, as in the reference
    prev = jnp.concatenate(
        [jnp.zeros(band.shape[:-1] + (1,), db.dtype), db[..., :-1]], axis=-1)
    # -inf minus -inf is NaN; NaN comparisons are false — matching C float
    # semantics in the reference loop.
    attack = (db - prev) > 16.0
    release = (prev - db) > 20.0
    hit = jnp.logical_or(attack, release)
    nsb = frame_sz // short_sz
    return jnp.any(hit.reshape(band.shape[:-1] + (-1, nsb)), axis=-1)
