"""QMF kernel tests: streaming-oracle equivalence + perfect reconstruction.

The conv formulation must match the reference's block-streaming filterbank
exactly (in exact arithmetic); the oracle below re-implements the streaming
loop from its mathematical definition (reference: src/qmf/qmf.h:47-89)."""
import numpy as np

from atracdenc_tpu.ops.qmf import QMF_WINDOW, QMF_DELAY, qmf_analysis, qmf_synthesis


def _streaming_analysis(x, block):
    """NumPy oracle: block-at-a-time analysis with a 46-sample history."""
    w = QMF_WINDOW
    hist = np.zeros(46)
    outs, outd = [], []
    idx = 47 - 2 * np.arange(24)
    for b0 in range(0, len(x), block):
        buf = np.concatenate([hist, x[b0: b0 + block]])
        for j in range(0, block, 2):
            lower = w[0::2] @ buf[idx + j]
            upper = w[1::2] @ buf[idx + j - 1]
            outs.append(lower + upper)
            outd.append(lower - upper)
        hist = buf[block:]
    return np.array(outs), np.array(outd)


def _streaming_synthesis(lo, up, block):
    w = QMF_WINDOW
    hist = np.zeros(46)
    out = []
    nin = 2 * block
    for b0 in range(0, len(lo), block):
        l, u = lo[b0: b0 + block], up[b0: b0 + block]
        merge = np.empty(nin)
        merge[0::2] = l + u
        merge[1::2] = l - u
        buf = np.concatenate([hist, merge])
        for p in range(nin // 2):
            s1 = w[0::2] @ buf[2 * p: 2 * p + 48: 2]
            s2 = w[1::2] @ buf[2 * p + 1: 2 * p + 48: 2]
            out.extend([s2, s1])
        hist = buf[nin:]
    return np.array(out)


def test_analysis_matches_streaming_oracle():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(2048).astype(np.float32)
    s, d = qmf_analysis(x)
    os_, od_ = _streaming_analysis(x.astype(np.float64), 512)
    np.testing.assert_allclose(np.asarray(s), os_, atol=3e-4)
    np.testing.assert_allclose(np.asarray(d), od_, atol=3e-4)


def test_synthesis_matches_streaming_oracle():
    rng = np.random.default_rng(8)
    lo = rng.standard_normal(512).astype(np.float32)
    up = rng.standard_normal(512).astype(np.float32)
    y = qmf_synthesis(lo, up)
    oy = _streaming_synthesis(lo.astype(np.float64), up.astype(np.float64), 256)
    np.testing.assert_allclose(np.asarray(y), oy, atol=3e-4)


def test_perfect_reconstruction():
    """analysis -> synthesis reconstructs the input with the 46-sample delay."""
    rng = np.random.default_rng(9)
    x = rng.standard_normal(4096).astype(np.float32)
    s, d = qmf_analysis(x)
    y = np.asarray(qmf_synthesis(s, d)) / 2.0  # sum/diff doubles the energy
    err = y[QMF_DELAY:] - x[: len(x) - QMF_DELAY]
    assert np.max(np.abs(err)) < 2e-3, np.max(np.abs(err))


def test_batched():
    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 3, 1024)).astype(np.float32)
    s, d = qmf_analysis(x)
    assert s.shape == (2, 3, 512) and d.shape == (2, 3, 512)
    y = qmf_synthesis(s, d)
    assert y.shape == (2, 3, 1024)
