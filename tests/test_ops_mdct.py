"""MDCT/IMDCT kernel tests, mirroring the reference's mdct_ut strategy
(round-trips at several sizes incl. random data; reference: test/ut coverage
described in SURVEY.md §4)."""
import numpy as np
import pytest

from atracdenc_tpu.ops.mdct import mdct, imdct, _mdct_matrix_np


@pytest.mark.parametrize("n", [32, 64, 256, 512])
def test_tdac_roundtrip_sine_window(n):
    """MDCT->IMDCT with 50%-overlap sine window must reconstruct (TDAC).

    With the reference scaling convention (forward 1/N, inverse 2) the
    windowed TDAC chain has gain 1/2; the codecs recover the other factor of
    2 in the QMF synthesis stages (see test_ops_qmf.py).
    """
    rng = np.random.default_rng(42)
    nframes = 8
    x = rng.standard_normal((nframes + 1) * (n // 2)).astype(np.float32)
    win = np.sin((np.arange(n) + 0.5) * np.pi / n).astype(np.float32)

    # analysis: frame i covers samples [i*n/2, i*n/2 + n)
    frames = np.stack([x[i * n // 2: i * n // 2 + n] * win for i in range(nframes)])
    spec = np.asarray(mdct(frames, scale=1.0 / n))
    inv = np.asarray(imdct(spec, scale=2.0)) * win

    # overlap-add; interior region must match input / 2
    out = np.zeros_like(x)
    for i in range(nframes):
        out[i * n // 2: i * n // 2 + n] += inv[i]
    interior = slice(n // 2, nframes * n // 2)
    np.testing.assert_allclose(out[interior], 0.5 * x[interior], atol=2e-5)


def test_scaling_convention():
    """mdct(scale=1/N) matches the reference TMDCT<N>(1) == direct/N."""
    n = 64
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    direct = _mdct_matrix_np(n) @ x.astype(np.float64)
    ours = np.asarray(mdct(x, scale=1.0 / n))
    np.testing.assert_allclose(ours, direct / n, rtol=0, atol=1e-5)


def test_batched_shapes():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5, 128)).astype(np.float32)
    s = mdct(x, 1.0 / 128)
    assert s.shape == (3, 5, 64)
    y = imdct(s)
    assert y.shape == (3, 5, 128)
