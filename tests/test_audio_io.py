"""Multi-format PCM I/O: WAV/AIFF/AU round-trips, content-based detection,
RAW output (reference parity: src/pcm_io_sndfile.cpp:24-41 — reads
auto-detect by content, writes pick the format from the extension)."""
import numpy as np
import pytest

from atracdenc_tpu.io import audio


def _sig(c=2, t=2000):
    n = np.arange(t)
    base = 0.5 * np.sin(2 * np.pi * 997 * n / 44100)
    return np.stack([base, 0.25 * base])[:c].astype(np.float32)


@pytest.mark.parametrize("ext", ["wav", "aiff", "au"])
def test_roundtrip(tmp_path, ext):
    pcm = _sig()
    path = str(tmp_path / f"x.{ext}")
    audio.write(path, pcm, 44100)
    got, rate = audio.read(path)
    assert rate == 44100
    assert got.shape == pcm.shape
    assert np.abs(got - pcm).max() <= 1.0 / 32768.0


def test_detection_ignores_extension(tmp_path):
    """An AIFF payload behind a .wav name must still read as AIFF."""
    pcm = _sig(c=1, t=500)
    real = str(tmp_path / "x.aiff")
    audio.write(real, pcm, 44100)
    lying = str(tmp_path / "x.wav")
    with open(real, "rb") as a, open(lying, "wb") as b:
        b.write(a.read())
    got, rate = audio.read(lying)
    assert rate == 44100 and got.shape == pcm.shape


def test_raw_output(tmp_path):
    pcm = _sig(c=1, t=300)
    path = str(tmp_path / "x.pcm")
    audio.write(path, pcm, 44100)
    raw = np.fromfile(path, "<i2")
    assert raw.shape == (300,)
    assert np.abs(raw / 32768.0 - pcm[0]).max() <= 1.0 / 32768.0


def test_mono_stereo_and_rates(tmp_path):
    for c, rate in [(1, 44100), (2, 48000)]:
        path = str(tmp_path / f"r{c}.au")
        audio.write(path, _sig(c=c, t=256), rate)
        got, r = audio.read(path)
        assert r == rate and got.shape[0] == c


def test_unknown_magic_rejected(tmp_path):
    path = str(tmp_path / "x.bin")
    with open(path, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        audio.read(path)
