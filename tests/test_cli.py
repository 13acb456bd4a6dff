"""CLI integration tests, mirroring the reference's Python suite
(reference: test/integration/input_file_tests.py): invalid inputs and
codec/container combinations are rejected with clear errors, container
auto-selection follows the output extension, UTF-8 filenames work, and
corrupted streams decode without crashing.
"""
import numpy as np
import pytest

from atracdenc_tpu import cli
from atracdenc_tpu.io import wav


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "in.wav"
    n = np.arange(512 * 12)
    sig = 0.5 * np.sin(2 * np.pi * 997 * n / 44100)
    wav.write(p, np.stack([sig, 0.7 * sig]).astype(np.float32), 44100)
    return p


def test_unsupported_sample_rate(tmp_path):
    p = tmp_path / "in48.wav"
    wav.write(p, np.zeros((1, 4800), np.float32), 48000)
    with pytest.raises(SystemExit, match="sample rate"):
        cli.main(["-e", "atrac1", "-i", str(p), "-o", str(tmp_path / "o.aea"),
                  "--nostdout"])


def test_container_matrix_rejection(wav_file, tmp_path):
    with pytest.raises(SystemExit, match="not supported"):
        cli.main(["-e", "atrac1", "--container", "rm", "-i", str(wav_file),
                  "-o", str(tmp_path / "o.rm"), "--nostdout"])
    with pytest.raises(SystemExit, match="not supported"):
        cli.main(["-e", "atrac3plus", "--container", "rm",
                  "-i", str(wav_file), "-o", str(tmp_path / "o.rm"),
                  "--nostdout"])


def test_bfuidxconst_range(wav_file, tmp_path):
    with pytest.raises(SystemExit, match="bfuidxconst"):
        cli.main(["-e", "atrac1", "--bfuidxconst", "9", "-i", str(wav_file),
                  "-o", str(tmp_path / "o.aea"), "--nostdout"])


def test_mode_required(wav_file, tmp_path):
    with pytest.raises(SystemExit, match="encode or decode"):
        cli.main(["-i", str(wav_file), "-o", str(tmp_path / "o.aea")])


def test_bfuidxfast_deprecated_noop(wav_file, tmp_path, capsys):
    out = tmp_path / "o.aea"
    cli.main(["-e", "atrac1", "--bfuidxfast", "-i", str(wav_file),
              "-o", str(out), "--nostdout"])
    assert "deprecated" in capsys.readouterr().out
    assert out.stat().st_size > 0


def test_at1_roundtrip_with_notransient(wav_file, tmp_path):
    out = tmp_path / "o.aea"
    cli.main(["-e", "atrac1", "--notransient=2", "-i", str(wav_file),
              "-o", str(out), "--nostdout"])
    dec = tmp_path / "o.wav"
    cli.main(["-d", "-i", str(out), "-o", str(dec), "--nostdout"])
    pcm, rate = wav.read(dec)
    assert rate == 44100 and pcm.shape[0] == 2
    assert np.abs(pcm).max() > 0.1


def test_utf8_filenames(wav_file, tmp_path):
    out = tmp_path / "выход⽇.aea"
    cli.main(["-e", "atrac1", "-i", str(wav_file), "-o", str(out),
              "--nostdout"])
    assert out.exists() and out.stat().st_size > 2048


def test_corrupted_aea_decodes_silently(wav_file, tmp_path):
    out = tmp_path / "o.aea"
    cli.main(["-e", "atrac1", "-i", str(wav_file), "-o", str(out),
              "--nostdout"])
    data = bytearray(out.read_bytes())
    rng = np.random.default_rng(0)
    for off in rng.integers(2048 + 212, len(data), 64):
        data[off] ^= 0xFF
    bad = tmp_path / "bad.aea"
    bad.write_bytes(bytes(data))
    dec = tmp_path / "bad.wav"
    cli.main(["-d", "-i", str(bad), "-o", str(dec), "--nostdout"])
    pcm, _ = wav.read(dec)
    assert np.isfinite(pcm).all() and np.abs(pcm).max() <= 1.0


def test_aiff_and_au_input(tmp_path):
    """Encoding accepts AIFF/AU input (reference reads via libsndfile
    content auto-detect, src/pcm_io_sndfile.cpp:45-52)."""
    from atracdenc_tpu.io import audio
    n = np.arange(512 * 8)
    sig = np.stack([0.5 * np.sin(2 * np.pi * 997 * n / 44100)]
                   * 2).astype(np.float32)
    for ext in ("aiff", "au"):
        src = tmp_path / f"in.{ext}"
        audio.write(str(src), sig, 44100)
        out = tmp_path / f"o_{ext}.aea"
        cli.main(["-e", "atrac1", "-i", str(src), "-o", str(out),
                  "--nostdout"])
        assert out.exists() and out.stat().st_size > 2048


def test_decode_to_au_output(tmp_path):
    from atracdenc_tpu.io import audio
    n = np.arange(512 * 8)
    sig = np.stack([0.5 * np.sin(2 * np.pi * 997 * n / 44100)]
                   * 2).astype(np.float32)
    src = tmp_path / "in.wav"
    wav.write(src, sig, 44100)
    enc = tmp_path / "o.aea"
    cli.main(["-e", "atrac1", "-i", str(src), "-o", str(enc), "--nostdout"])
    dec = tmp_path / "o.au"
    cli.main(["-d", "-i", str(enc), "-o", str(dec), "--nostdout"])
    assert dec.read_bytes()[:4] == b".snd"
    pcm, rate = audio.read(str(dec))
    assert rate == 44100 and np.abs(pcm).max() > 0.1


def test_container_autoselect_from_extension(wav_file, tmp_path):
    out = tmp_path / "o.oma"
    cli.main(["-e", "atrac3", "-i", str(wav_file), "-o", str(out),
              "--nostdout"])
    assert out.read_bytes()[:3] == b"EA3"
    out2 = tmp_path / "o.at3"
    cli.main(["-e", "atrac3", "-i", str(wav_file), "-o", str(out2),
              "--nostdout"])
    assert out2.read_bytes()[:4] == b"RIFF"


def test_decode_atrac3_oma_riff_rm(wav_file, tmp_path):
    """-d decodes ATRAC3 from OMA/RIFF/RM — a capability beyond the
    reference, whose decode mode is ATRAC1-only (main.cpp:649-655)."""
    from atracdenc_tpu.io import audio
    a, _ = audio.read(str(wav_file))
    for container, ext in (("oma", "oma"), ("riff", "at3"), ("rm", "rm")):
        enc = tmp_path / f"x.{ext}"
        cli.main(["-e", "atrac3", "-i", str(wav_file), "-o", str(enc),
                  "--container", container, "--nostdout"])
        dec = tmp_path / f"x_{container}.wav"
        cli.main(["-d", "-i", str(enc), "-o", str(dec), "--nostdout"])
        b, rate = audio.read(str(dec))
        assert rate == 44100
        n = min(a.shape[1], b.shape[1])
        ra = float(np.sqrt((a[:, :n] ** 2).mean()))
        rb = float(np.sqrt((b[:, :n] ** 2).mean()))
        assert rb > 0.5 * ra, (container, ra, rb)


@pytest.mark.slow
def test_decode_atrac3plus_oma(wav_file, tmp_path):
    from atracdenc_tpu.io import audio
    enc = tmp_path / "p.oma"
    cli.main(["-e", "atrac3plus", "-i", str(wav_file), "-o", str(enc),
              "--nostdout"])
    dec = tmp_path / "p.wav"
    cli.main(["-d", "-i", str(enc), "-o", str(dec), "--nostdout"])
    a, _ = audio.read(str(wav_file))
    b, _ = audio.read(str(dec))
    n = min(a.shape[1], b.shape[1])
    ra = float(np.sqrt((a[:, :n] ** 2).mean()))
    rb = float(np.sqrt((b[:, :n] ** 2).mean()))
    assert rb > 0.5 * ra


def test_corrupted_oma_fails_cleanly_or_decodes(wav_file, tmp_path):
    """Corrupt ATRAC3 compressed input must never escape as a raw
    traceback: either the (new-capability) decoder copes, or the CLI
    exits with the reference's "Encode/Decode error" containment
    (main.cpp:709-720)."""
    out = tmp_path / "o.oma"
    cli.main(["-e", "atrac3", "-i", str(wav_file), "-o", str(out),
              "--nostdout"])
    data = bytearray(out.read_bytes())
    rng = np.random.default_rng(1)
    for seed_off in range(4):
        bad = bytearray(data)
        for off in rng.integers(96, len(bad), 48):
            bad[off] ^= 0xFF
        p = tmp_path / f"bad{seed_off}.oma"
        p.write_bytes(bytes(bad))
        dec = tmp_path / f"bad{seed_off}.wav"
        try:
            cli.main(["-d", "-i", str(p), "-o", str(dec), "--nostdout"])
        except SystemExit as e:
            assert "error" in str(e.code).lower()
            continue
        # when the decode succeeds the PCM must be finite and in range
        # (corrupt tonal quantizers used to smuggle NaN into the writer)
        from atracdenc_tpu.containers import oma
        from atracdenc_tpu.models.atrac3.decoder import decode_track
        frames, info = oma.read(str(p))
        pcm = decode_track(frames, channels=info["channels"],
                           js=info["joint_stereo"])
        assert np.isfinite(pcm).all() and np.abs(pcm).max() <= 1.0


def test_truncated_containers_fail_cleanly(wav_file, tmp_path):
    """Truncated OMA/RIFF headers and bodies -> clean SystemExit."""
    out = tmp_path / "t.oma"
    cli.main(["-e", "atrac3", "-i", str(wav_file), "-o", str(out),
              "--nostdout"])
    blob = out.read_bytes()
    for cut in (10, 90, 100, len(blob) - 7):
        p = tmp_path / f"cut{cut}.oma"
        p.write_bytes(blob[:cut])
        try:
            cli.main(["-d", "-i", str(p), "-o",
                      str(tmp_path / f"cut{cut}.wav"), "--nostdout"])
        except SystemExit as e:
            assert str(e.code)


def test_decode_atrac3_lp4_joint_stereo(wav_file, tmp_path):
    """LP4 (66.15 kbit/s joint stereo) end-to-end: the OMA params word
    carries the JS bit and -d routes it into the M/S decode path."""
    from atracdenc_tpu.io import audio
    enc = tmp_path / "js.oma"
    cli.main(["-e", "atrac3_lp4", "-i", str(wav_file), "-o", str(enc),
              "--nostdout"])
    dec = tmp_path / "js.wav"
    cli.main(["-d", "-i", str(enc), "-o", str(dec), "--nostdout"])
    a, _ = audio.read(str(wav_file))
    b, rate = audio.read(str(dec))
    assert rate == 44100 and b.shape[0] == 2
    n = min(a.shape[1], b.shape[1])
    ra = float(np.sqrt((a[:, :n] ** 2).mean()))
    rb = float(np.sqrt((b[:, :n] ** 2).mean()))
    assert rb > 0.5 * ra, (ra, rb)


@pytest.mark.slow
def test_corrupted_at3p_oma_fails_cleanly_or_decodes(wav_file, tmp_path):
    enc = tmp_path / "pf.oma"
    cli.main(["-e", "atrac3plus", "-i", str(wav_file), "-o", str(enc),
              "--nostdout"])
    data = bytearray(enc.read_bytes())
    rng = np.random.default_rng(7)
    for off in rng.integers(96, len(data), 96):
        data[off] ^= 0xFF
    bad = tmp_path / "pf_bad.oma"
    bad.write_bytes(bytes(data))
    try:
        cli.main(["-d", "-i", str(bad), "-o",
                  str(tmp_path / "pf_bad.wav"), "--nostdout"])
    except SystemExit as e:
        assert str(e.code)


@pytest.mark.slow
def test_at3_exact_flag_roundtrip(wav_file, tmp_path):
    """--exact routes atrac3 encodes through the reference-float-semantics
    encoder; output must decode like the fast path's."""
    from atracdenc_tpu.io import audio
    enc = tmp_path / "x.oma"
    cli.main(["-e", "atrac3", "--exact", "-i", str(wav_file), "-o",
              str(enc), "--nostdout"])
    dec = tmp_path / "x.wav"
    cli.main(["-d", "-i", str(enc), "-o", str(dec), "--nostdout"])
    a, _ = audio.read(str(wav_file))
    b, _ = audio.read(str(dec))
    n = min(a.shape[1], b.shape[1])
    ra = float(np.sqrt((a[:, :n] ** 2).mean()))
    rb = float(np.sqrt((b[:, :n] ** 2).mean()))
    assert rb > 0.5 * ra
