"""Two-band QMF analysis/synthesis as whole-track strided convolutions.

The reference runs a 48-tap polyphase QMF one 512/256-sample block at a time
with a 46-sample persistent history (reference: src/qmf/qmf.h:47-89,
src/qmf/qmf.cpp:25-34).  Because the history is just the previous 46 input
samples, the streaming loop is exactly equivalent to one strided convolution
over the whole track with 46 leading zeros — which is how we express it here
so XLA can lower it to MXU-sized implicit GEMMs batched over channels/streams.

Definitions (matching the reference's streaming semantics bit-for-bit in
exact arithmetic, with zero initial history):

  analysis:  lower[m] = sum_{i<24} w[2i]   * x[2m + 1 - 2i]
             upper[m] = sum_{i<24} w[2i+1] * x[2m - 2i]
             out_sum  = lower + upper      (the "lower band" result)
             out_diff = lower - upper      (the "upper band" result)

  synthesis: merge[2m] = lo[m] + up[m]; merge[2m+1] = lo[m] - up[m]
             pcm[2p]   = sum_{i odd}  merge[2p + i - 46] * w[i]
             pcm[2p+1] = sum_{i even} merge[2p + i - 46] * w[i]

where w is the symmetric 48-tap prototype (w[i] = w[47-i] = 2*TapHalf[i]).
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["QMF_WINDOW", "qmf_analysis", "qmf_synthesis"]

# 24 half-taps of the 48-tap symmetric prototype lowpass
# (reference: src/qmf/qmf.cpp:25-32; the full window is TapHalf mirrored, x2).
_TAP_HALF = np.array([
    -0.00001461907, -0.00009205479, -0.000056157569, 0.00030117269,
    0.0002422519, -0.00085293897, -0.0005205574, 0.0020340169,
    0.00078333891, -0.0042153862, -0.00075614988, 0.0078402944,
    -0.000061169922, -0.01344162, 0.0024626821, 0.021736089,
    -0.007801671, -0.034090221, 0.01880949, 0.054326009,
    -0.043596379, -0.099384367, 0.13207909, 0.46424159,
], dtype=np.float64)

QMF_WINDOW = np.concatenate([_TAP_HALF, _TAP_HALF[::-1]]) * 2.0  # [48]
QMF_DELAY = 46  # analysis+synthesis group delay in input samples


def _conv1d(x: jax.Array, kernel: np.ndarray, stride: int, pad_lo: int,
            pad_hi: int) -> jax.Array:
    """Batched 1-D cross-correlation over the last axis.

    x: [..., T]; kernel: [K] numpy;  out[..., m] = sum_k x[m*stride - pad_lo + k] * kernel[k]
    """
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    lhs = x.reshape((-1, 1, t))                       # [B, C=1, T]
    rhs = jnp.asarray(kernel, dtype=x.dtype).reshape((1, 1, -1))  # [O=1, I=1, K]
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(stride,),
        padding=[(pad_lo, pad_hi)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(batch_shape + (out.shape[-1],))


def _analysis_kernels(dtype=np.float32):
    """47-tap even/odd polyphase kernels in cross-correlation layout.

    lower[m] = sum_j a[j] * x[2m+1-j]  with a[j] = w[j] for even j, else 0
    upper[m] = sum_j b[j] * x[2m+1-j]  with b[j] = w[j] for odd j, else 0
    Cross-correlation form: out[m] = sum_k x[2m+1-46+k] * h[k], h[k] = a/b[46-k].
    """
    a = np.zeros(47, dtype=np.float64)
    b = np.zeros(47, dtype=np.float64)
    a[0:47:2] = QMF_WINDOW[0:47:2]   # even taps -> lower
    b[1:47:2] = QMF_WINDOW[1:47:2]   # odd taps  -> upper
    return a[::-1].astype(dtype), b[::-1].astype(dtype)


def qmf_analysis(x: jax.Array):
    """Split [..., T] (T even) into (sum, diff) half-rate bands [..., T/2].

    Equivalent to streaming TQmf::Analysis over consecutive blocks with zero
    initial history (reference: src/qmf/qmf.h:47-64).
    """
    ka, kb = _analysis_kernels()
    # out[m] needs x at indices 2m+1-46 .. 2m+1  ->  pad_lo=45, pad_hi=0
    lower = _conv1d(x, ka, stride=2, pad_lo=45, pad_hi=0)
    upper = _conv1d(x, kb, stride=2, pad_lo=45, pad_hi=0)
    return lower + upper, lower - upper


def qmf_synthesis(lo: jax.Array, up: jax.Array) -> jax.Array:
    """Merge half-rate (sum, diff) bands [..., M] back to [..., 2M].

    Equivalent to streaming TQmf::Synthesis with zero initial history
    (reference: src/qmf/qmf.h:66-89).  Output is delayed 46 samples relative
    to the analysis input (the standard QMF analysis+synthesis group delay).
    """
    m = lo.shape[-1]
    merge = jnp.stack([lo + up, lo - up], axis=-1).reshape(lo.shape[:-1] + (2 * m,))
    w = QMF_WINDOW
    # pcm[2p]   = sum_{i odd}  merge[2p + i - 46] * w[i]
    # pcm[2p+1] = sum_{i even} merge[2p + i - 46] * w[i]
    # Cross-correlation with kernels k[j] = w_masked[j] evaluated at offset -46.
    k_even = np.zeros(48)
    k_odd = np.zeros(48)
    k_even[0:48:2] = QMF_WINDOW[0:48:2]
    k_odd[1:48:2] = QMF_WINDOW[1:48:2]
    # out_even[p] = sum_j k_odd[j] * merge[2p + j - 46]: pad_lo=46
    even = _conv1d(merge, k_odd.astype(np.float32), stride=2, pad_lo=46, pad_hi=1)
    odd = _conv1d(merge, k_even.astype(np.float32), stride=2, pad_lo=46, pad_hi=1)
    out = jnp.stack([even, odd], axis=-1).reshape(lo.shape[:-1] + (-1,))
    return out[..., : 2 * m]
