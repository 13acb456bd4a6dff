"""ATRAC3+ tests: PQF golden data, transform round trips, codec closed loop.

The PQF/IPQF pair is validated the way the reference validates it
(ipqf_ut.cpp): the decoder-side IPQF against golden data derived from the
real AT3P decoder (tests/golden/ipqftest_*.dat, 2^-26 tolerance), and the
analysis filterbank by inverting it with that independently-validated IPQF.
The reference cannot build its own AT3P encoder here (its libgha submodule
is absent), so encoder coverage is closed-loop through our QA decoder.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from atracdenc_tpu.models.atrac3p import frame as at3p_frame
from atracdenc_tpu.models.atrac3p import pqf, tables as T
from atracdenc_tpu.models.atrac3p.decoder import decode_track
from atracdenc_tpu.models.atrac3p.encoder import encode_track
from atracdenc_tpu.models.atrac3p.mdct import mdct_frames, imdct_frames

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_ipqf_matches_golden_decoder_data():
    mr = np.fromfile(os.path.join(GOLDEN, "ipqftest_pcm_mr.dat"), np.float32)
    ref = np.fromfile(os.path.join(GOLDEN, "ipqftest_pcm_out.dat"), np.float32)
    bands = np.concatenate(
        [mr[i:i + 2048].reshape(16, 128) for i in range(0, 8192, 2048)],
        axis=1)
    out = pqf.ipqf_np(bands)
    assert np.abs(out - ref).max() < 1.0 / (1 << 26)


def test_pqf_roundtrip_chirp():
    n = np.arange(2048 * 4)
    x = np.sin((n + n * n * 0.5 / 2.0) * 2 * np.pi / len(n)).astype(np.float32)
    bands = np.asarray(pqf.analysis(jnp.asarray(x[None])))[0]
    rec = pqf.ipqf_np(bands)
    d = pqf.PQF_DELAY_SAMPLES
    err = np.abs(rec[d:7000] - x[:7000 - d]).max()
    assert err < 1.0 / (1 << 12), f"roundtrip err {err}"


def test_mdct_roundtrip():
    rng = np.random.default_rng(0)
    b = (0.3 * rng.standard_normal((1, 5, 16, 128))).astype(np.float32)
    rec = np.asarray(imdct_frames(mdct_frames(jnp.asarray(b))))
    assert np.abs(rec[0, 1:] - b[0, :-1]).max() < 1e-5


@pytest.fixture(scope="module")
def coded():
    rng = np.random.default_rng(0)
    t = 2048 * 6
    n = np.arange(t)
    pcm = np.stack([
        0.5 * np.sin(2 * np.pi * 997 * n / 44100)
        + 0.02 * rng.standard_normal(t),
        0.4 * np.sin(2 * np.pi * 1503 * n / 44100)]).astype(np.float32)
    planes = encode_track(pcm, use_gha=False)
    frames = at3p_frame.pack(planes, 2)
    return pcm, planes, frames


def test_frame_size_and_parse_roundtrip(coded):
    pcm, planes, frames = coded
    assert frames.shape[1] == T.FRAME_BYTES
    p = at3p_frame.unpack_frame(frames[2], 2)
    nq = p["num_qu"]
    assert nq == planes["num_qu"][2]
    assert (p["wordlen"][0, :nq] == T.FIXED_WORDLEN[:nq]).all()
    assert (p["sfi"][:, :nq] == planes["sfi"][:, 2, :nq]).all()
    assert (p["spec_tab"][:, :nq] == planes["spec_tab"][:, 2, :nq]).all()
    for ch in range(2):
        for qu in range(nq):
            ln = T.SPECS_PER_BLOCK[qu]
            assert (p["mant"][ch, qu, :ln]
                    == planes["mant"][ch, 2, qu, :ln]).all()
    assert p["bits_used"] <= T.FRAME_BYTES * 8 - 3


def test_closed_loop_quality(coded):
    pcm, _, frames = coded
    dec = decode_track(frames, 2)
    d = 2 * T.NUM_SAMPLES       # look-ahead + OLA latency (PQF compensated)
    t = pcm.shape[1]
    m = t - d - 2048
    x = pcm[:, :m].astype(np.float64)
    y = dec[:, d:d + m].astype(np.float64)
    p = 10 * np.log10((x ** 2).mean() / ((x - y) ** 2).mean())
    # the fixed wordlen-7 mantissa ladder bounds the SNR near 28 dB
    assert p > 25.0, f"closed-loop PSNR {p:.2f} dB"


def test_mono(coded):
    rng = np.random.default_rng(1)
    pcm = (0.3 * rng.standard_normal((1, 2048 * 3))).astype(np.float32)
    planes = encode_track(pcm)
    frames = at3p_frame.pack(planes, 1)
    assert frames.shape == (3, T.FRAME_BYTES)
    p = at3p_frame.unpack_frame(frames[1], 1)
    assert p["num_qu"] == planes["num_qu"][1]


def test_gha_tonal_model_improves_quality(coded):
    pcm, _, frames_plain = coded
    planes = encode_track(pcm, use_gha=True)
    frames = at3p_frame.pack(planes, 2)
    # tones survive the wire
    p = at3p_frame.unpack_frame(frames[3], 2)
    assert p["tones"] is not None and p["tones"]["valid"].any()
    dec_gha = decode_track(frames, 2)
    dec_plain = decode_track(frames_plain, 2)
    d = 2 * T.NUM_SAMPLES
    t = pcm.shape[1]
    m = t - d - 2048
    x = pcm[:, :m].astype(np.float64)

    def psnr(y):
        e = x - y[:, d:d + m].astype(np.float64)
        return 10 * np.log10((x ** 2).mean() / (e ** 2).mean())

    p_gha, p_plain = psnr(dec_gha), psnr(dec_plain)
    assert p_gha > p_plain + 3.0, f"GHA {p_gha:.2f} vs plain {p_plain:.2f} dB"


def test_byte_identity_vs_reference_writer():
    """The whole AT3P path (PQF, delay, MDCT, scale, fixed wordlens, spectrum
    table search, channel-unit serialization, numQU budget) against golden
    frames from the reference's own bitstream writer, compiled without the
    absent libgha (GHA-disabled flow)."""
    data = np.load(os.path.join(GOLDEN, "at3p_golden.npz"))
    for pcm_key, ref_key in (("pcm_mixed", "ref_mixed"),
                             ("pcm_loud", "ref_loud")):
        pcm, ref = data[pcm_key], data[ref_key]
        planes = encode_track(pcm, use_gha=False)
        ours = at3p_frame.pack(planes, 2)
        n = min(len(ours), len(ref))
        assert (ours[:n] == ref[:n]).all(), pcm_key
    # the loud corpus must exercise the NumQuantUnits shrink
    planes = encode_track(data["pcm_loud"], use_gha=False)
    assert (planes["num_qu"] < 32).any()
