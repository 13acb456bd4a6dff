"""Psychoacoustic helpers: ATH curve, loudness curve, loudness tracking.

Pure-table precomputation happens in NumPy at import/trace time; the per-frame
loudness recurrence is the one true sequential dependency of the encoders and
is expressed as a `lax.scan` (reference: src/atrac/atrac_psy_common.{h,cpp}).
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ath_formula_frank", "calc_ath", "create_loudness_curve",
           "track_loudness_scan", "analyze_scale_factor_spread"]

# Absolute-threshold-of-hearing table in millibel rel 20 uPa, 4 points per
# third starting at 10 Hz (borrowed by the reference from Musepack;
# atrac_psy_common.cpp:33-95).
_FRANK_TAB = np.array([
    9669, 9669, 9626, 9512, 9353, 9113, 8882, 8676,
    8469, 8243, 7997, 7748, 7492, 7239, 7000, 6762,
    6529, 6302, 6084, 5900, 5717, 5534, 5351, 5167,
    5004, 4812, 4638, 4466, 4310, 4173, 4050, 3922,
    3723, 3577, 3451, 3281, 3132, 3036, 2902, 2760,
    2658, 2591, 2441, 2301, 2212, 2125, 2018, 1900,
    1770, 1682, 1594, 1512, 1430, 1341, 1260, 1198,
    1136, 1057, 998, 943, 887, 846, 744, 712,
    693, 668, 637, 606, 580, 555, 529, 502,
    475, 448, 422, 398, 375, 351, 327, 322,
    312, 301, 291, 268, 246, 215, 182, 146,
    107, 61, 13, -35, -96, -156, -179, -235,
    -295, -350, -401, -421, -446, -499, -532, -535,
    -513, -476, -431, -313, -179, 8, 203, 403,
    580, 736, 881, 1022, 1154, 1251, 1348, 1421,
    1479, 1399, 1285, 1193, 1287, 1519, 1914, 2369,
    3352, 4352, 5352, 6352, 7352, 8352, 9352, 9999,
    9999, 9999, 9999, 9999,
], dtype=np.float64)


def ath_formula_frank(freq):
    """ATH in dB at `freq` Hz (scalar or array)."""
    f = np.clip(np.asarray(freq, dtype=np.float64), 10.0, 29853.0)
    freq_log = 40.0 * np.log10(0.1 * f)
    index = freq_log.astype(np.int64)
    frac = freq_log - index
    return 0.01 * (_FRANK_TAB[index] * (1.0 - frac) + _FRANK_TAB[index + 1] * frac)


def calc_ath(length, sample_rate):
    """Per-spectral-line ATH in dB (atrac_psy_common.cpp:126-140)."""
    mf = sample_rate / 2000.0
    i = np.arange(length, dtype=np.float64)
    f_khz = (i + 1.0) * mf / length
    trh = ath_formula_frank(1.0e3 * f_khz) - 100.0
    trh -= f_khz * f_khz * 0.015
    return trh


def create_loudness_curve(sz):
    """Equal-loudness weighting per spectral line (atrac_psy_common.cpp:142-156)."""
    i = np.arange(sz, dtype=np.float64)
    f = (i + 3.0) * 0.5 * 44100.0 / sz
    t = np.log10(f) - 3.5
    t = -10.0 * t * t + 3.0 - f / 3000.0
    return np.power(10.0, 0.1 * t).astype(np.float32)


def track_loudness_scan(l0, l1, use_both, use_one, init):
    """Per-frame loudness IIR across a track.

    State update per frame (atrac_psy_common.h:46-54, atrac1denc.cpp:243-247):
      if use_both: L = 0.98 L + 0.01 (l0 + l1)
      elif use_one: L = 0.98 L + 0.02 l0
      else: unchanged
    Returns the post-update loudness per frame, shape [n_frames].

    This is the encoder's only true cross-frame recurrence.  It is linear
    (L_n = a_n * L_{n-1} + b_n with a_n in {0.98, 1}) and could run as a
    log-depth associative scan, but float addition is not associative: the
    regrouped result differs in the last ulp from the reference's sequential
    IIR, and those ulps cross ATH-gate knife edges.  A sequential `lax.scan`
    of scalar ops is exact (and cheap — the carry is one float per stream);
    when frame ranges are sharded, the cross-shard stitch is one affine
    (a, b) pair exchanged over ICI.
    """
    a = jnp.where(use_both | use_one, 0.98, 1.0).astype(l0.dtype)
    b = jnp.where(use_both, 0.01 * (l0 + l1),
                  jnp.where(use_one, 0.02 * l0, 0.0)).astype(l0.dtype)

    def step(carry, ab):
        a_k, b_k = ab
        out = a_k * carry + b_k
        return out, out

    _, seq = jax.lax.scan(step, jnp.asarray(init, l0.dtype), (a, b))
    return seq


def analyze_scale_factor_spread(sfis, valid_mask):
    """sigma(scale factor indices)/14, clamped to [0,1]; batched over leading
    axes.  (atrac_psy_common.cpp:105-124; used by ATRAC3, not ATRAC1.)"""
    n = jnp.sum(valid_mask, axis=-1)
    mean = jnp.sum(jnp.where(valid_mask, sfis, 0), axis=-1) / n
    var = jnp.sum(jnp.where(valid_mask, (sfis - mean[..., None]) ** 2, 0), axis=-1) / n
    sigma = jnp.minimum(jnp.sqrt(var), 14.0)
    return sigma / 14.0
