"""ATRAC3+ per-subband MDCT/IMDCT (sine windows), batched over frames.

Reference semantics (src/atrac/at3p/at3p_mdct.cpp:52-100): per subband the
MDCT input is [stored prev half | falling-windowed current], the stored half
being the previous frame's samples under the rising window; both windows are
the 2*sin(...) SineWin128.  The encoder always uses sine windows (steep
windows exist in the format but are never selected, at3p.cpp:158-160).
"""
import jax
import jax.numpy as jnp
import numpy as np

from atracdenc_tpu.ops.mdct import mdct_matrix
from . import tables as T

SINE_WIN_128 = (2.0 * np.sin((np.arange(128) + 0.5)
                             * (np.pi / 256.0))).astype(np.float32)


def mdct_frames(bands):
    """[..., F, 16, 128] band samples -> specs [..., F, 2048].

    Odd subbands are spectrum-reversed (at3p_mdct.cpp:78-80).
    """
    w = jnp.asarray(SINE_WIN_128)
    stored = w * bands                        # rising window (next-half store)
    prev = jnp.pad(stored[..., :-1, :, :], [(0, 0)] * (bands.ndim - 3)
                   + [(1, 0), (0, 0), (0, 0)])
    tail = w[::-1] * bands                    # falling window
    buf = jnp.concatenate([prev, tail], axis=-1)          # [..., F, 16, 256]

    basis = mdct_matrix(256, 1.0 / 256.0, buf.dtype)      # TMDCT<256>(1)
    spec = jax.lax.dot_general(
        buf, basis, dimension_numbers=(((buf.ndim - 1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=buf.dtype)
    flip = jnp.where((jnp.arange(16) % 2 == 1)[:, None],
                     spec[..., ::-1], spec)
    return flip.reshape(bands.shape[:-2] + (2048,))


def imdct_frames(specs):
    """QA inverse: [..., F, 2048] -> bands [..., F, 16, 128]; out[f]
    reconstructs input frame f-1 (OLA latency), mirroring TAt3pMIDCT."""
    s = specs.reshape(specs.shape[:-1] + (16, 128))
    s = jnp.where((jnp.arange(16) % 2 == 1)[:, None], s[..., ::-1], s)
    basis = mdct_matrix(256, 1.0, s.dtype)    # TMIDCT<256>(256) == direct
    inv = jax.lax.dot_general(
        s, basis, dimension_numbers=(((s.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=s.dtype)
    w = jnp.asarray(SINE_WIN_128)
    head = inv[..., :128] * w
    tail = inv[..., 128:] * w[::-1]
    prev = jnp.pad(tail[..., :-1, :, :], [(0, 0)] * (inv.ndim - 3)
                   + [(1, 0), (0, 0), (0, 0)])
    return head + prev
