"""ATRAC1 framed MDCT/IMDCT tests.

The streaming oracle below re-implements the reference's per-frame windowing
chain (atrac1denc.cpp:70-137) in NumPy from its behavioral description; the
batched matrix formulation must match it for arbitrary long/short window-mode
sequences, and enc->dec must reconstruct band signals with the known
32-sample framing delay and per-band gain.
"""
import numpy as np
import pytest

from atracdenc_tpu.ops.mdct import _mdct_matrix_np
from atracdenc_tpu.models.atrac1.mdct import mdct_frames, imdct_frames, _BANDS

SINE = np.sin((np.arange(32) + 0.5) * np.pi / 64.0)


def oracle_mdct(band_frames, short_flags, band):
    bufsz, n, lscale, winstart, sscale = _BANDS[band]
    m_long = _mdct_matrix_np(n)
    m64 = _mdct_matrix_np(64)
    nf = band_frames.shape[0]
    out = np.zeros((nf, bufsz))
    src = np.zeros(bufsz + 32)  # [0:bufsz) frame, [bufsz:bufsz+32) carried tail
    for fi in range(nf):
        src[:bufsz] = band_frames[fi]
        nblk = bufsz // 32 if short_flags[fi] else 1
        blksz = 32 if short_flags[fi] else bufsz
        ws = 0 if short_flags[fi] else winstart
        mult = 2.0 if (short_flags[fi] and band == 2) else 1.0
        blockpos = 0
        for k in range(nblk):
            tmp = np.zeros(n if nblk == 1 else 64)
            tmp[ws: ws + 32] = src[bufsz: bufsz + 32]
            tail_src = src[blockpos + blksz - 32: blockpos + blksz].copy()
            src[bufsz: bufsz + 32] = SINE * tail_src
            src[blockpos + blksz - 32: blockpos + blksz] = SINE[::-1] * tail_src
            tmp[ws + 32: ws + 32 + blksz] = src[blockpos: blockpos + blksz]
            m = m_long if nblk == 1 else m64
            sc = lscale if nblk == 1 else (0.5 / 64.0)
            sp = sc * (m @ tmp) * mult
            if band:
                sp = sp[::-1]
            out[fi, blockpos: blockpos + blksz] = sp
            blockpos += 32 if nblk > 1 else blksz
    return out


def oracle_imdct(specs, short_flags, band):
    bufsz, n, _, _, _ = _BANDS[band]
    m_long = _mdct_matrix_np(n)
    m64 = _mdct_matrix_np(64)
    nf = specs.shape[0]
    out = np.zeros((nf, bufsz))
    prev_tail = np.zeros(16)
    for fi in range(nf):
        nblk = bufsz // 32 if short_flags[fi] else 1
        blksz = 32 if short_flags[fi] else bufsz
        invbuf = np.zeros(bufsz)
        tail = prev_tail
        pos = 0
        dst = np.zeros(bufsz)
        for k in range(nblk):
            sp = specs[fi, pos: pos + blksz].copy()
            if band:
                sp = sp[::-1]
            m = m_long if nblk == 1 else m64
            inv = 2.0 * (m.T @ sp)
            half = inv[len(inv) // 4: 3 * len(inv) // 4]
            invbuf[pos: pos + blksz if nblk == 1 else pos + 32] = half[:blksz if nblk == 1 else 32]
            # vector_fmul_window at block start
            head = invbuf[pos: pos + 16]
            for p in range(16):
                dst[pos + p] = tail[p] * SINE[31 - p] - head[15 - p] * SINE[p]
                dst[pos + 31 - p] = tail[p] * SINE[p] + head[15 - p] * SINE[31 - p]
            tail = invbuf[pos + 16: pos + 32]
            pos += 32 if nblk > 1 else blksz
        if nblk == 1:
            dst[32:] = invbuf[16: bufsz - 16]
            prev_tail = invbuf[bufsz - 16:]
        else:
            prev_tail = invbuf[bufsz - 16:]
        out[fi] = dst
    return out


@pytest.mark.parametrize("band", [0, 1, 2])
def test_mdct_matches_oracle(band):
    bufsz = _BANDS[band][0]
    rng = np.random.default_rng(band)
    nf = 10
    frames = rng.standard_normal((nf, bufsz)).astype(np.float32)
    flags = rng.integers(0, 2, nf).astype(bool)
    ours = np.asarray(mdct_frames(frames, flags, band))
    ref = oracle_mdct(frames.astype(np.float64), flags, band)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("band", [0, 1, 2])
def test_imdct_matches_oracle(band):
    bufsz = _BANDS[band][0]
    rng = np.random.default_rng(10 + band)
    nf = 10
    specs = rng.standard_normal((nf, bufsz)).astype(np.float32)
    flags = rng.integers(0, 2, nf).astype(bool)
    ours = np.asarray(imdct_frames(specs, flags, band))
    ref = oracle_imdct(specs.astype(np.float64), flags, band)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("band", [0, 1, 2])
def test_roundtrip_gain_and_delay(band):
    """enc->dec reconstructs the band signal: delay 32, gain 1/4 (bands 0,1)
    or 1/2 (band 2) — the QMF synthesis stages recover the rest."""
    bufsz = _BANDS[band][0]
    rng = np.random.default_rng(20 + band)
    nf = 8
    frames = rng.standard_normal((nf, bufsz)).astype(np.float32)
    for flags in (np.zeros(nf, bool), np.ones(nf, bool),
                  rng.integers(0, 2, nf).astype(bool)):
        spec = mdct_frames(frames, flags, band)
        rec = np.asarray(imdct_frames(spec, flags, band)).reshape(-1)
        x = frames.reshape(-1)
        gain = 0.5 if band == 2 else 0.25
        np.testing.assert_allclose(rec[32 + bufsz:], gain * x[bufsz:-32],
                                   atol=1e-3)
