"""Tool coverage: omainfo / omacp (liboma tool equivalents) and the batch
transcoder's resume + atomic-output contract (fast tier)."""
import os

import numpy as np
import pytest

from atracdenc_tpu import cli
from atracdenc_tpu.io import wav


@pytest.fixture(scope="module")
def oma_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools")
    src = d / "in.wav"
    n = np.arange(1024 * 8)
    sig = 0.5 * np.sin(2 * np.pi * 997 * n / 44100)
    wav.write(src, np.stack([sig, 0.7 * sig]).astype(np.float32), 44100)
    out = d / "in.oma"
    cli.main(["-e", "atrac3", "-i", str(src), "-o", str(out), "--nostdout"])
    return src, out


def test_omainfo(oma_file, capsys):
    from atracdenc_tpu.tools import omainfo
    _, out = oma_file
    assert omainfo.main([str(out)]) == 0
    text = capsys.readouterr().out
    assert "ATRAC3" in text and "framesize: 384" in text \
        and "samplerate: 44100" in text


def test_omainfo_usage(capsys):
    from atracdenc_tpu.tools import omainfo
    assert omainfo.main([]) == 1
    assert "usage" in capsys.readouterr().out


def test_omacp_roundtrip(oma_file, tmp_path, capsys):
    from atracdenc_tpu.tools import omacp
    _, out = oma_file
    cp = tmp_path / "copy.oma"
    assert omacp.main([str(out), str(cp)]) == 0
    text = capsys.readouterr().out
    assert "codec: ATRAC3" in text and "bitrate: 132300" in text
    # our writer produced the input, so the copy is byte-identical
    assert cp.read_bytes() == out.read_bytes()


def test_transcode_resume_and_atomic_output(oma_file, tmp_path, capsys):
    from atracdenc_tpu.tools import transcode
    src, _ = oma_file
    out_dir = tmp_path / "enc"
    transcode.main([str(src), "--codec", "atrac3",
                    "--out-dir", str(out_dir)])
    final = out_dir / (os.path.splitext(os.path.basename(src))[0] + ".oma")
    assert final.exists() and final.stat().st_size > 96
    first = final.read_bytes()
    # no temp leftovers (atomic rename)
    assert [p for p in os.listdir(out_dir)] == [final.name]
    # --resume skips the existing output
    mtime = final.stat().st_mtime_ns
    transcode.main([str(src), "--codec", "atrac3",
                    "--out-dir", str(out_dir), "--resume"])
    assert "skip" in capsys.readouterr().out
    assert final.stat().st_mtime_ns == mtime
    assert final.read_bytes() == first
