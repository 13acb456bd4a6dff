"""Container byte-format tests: OMA, RIFF/AT3, RM headers and framing.

Header layouts were verified byte-for-byte against the reference writers
(src/lib/liboma/src/liboma.c:205-236, src/at3.cpp:160-225, src/rm.cpp) on
identical frame payloads at build time.
"""
import struct

import numpy as np

from atracdenc_tpu.containers import at3, oma, rm


def _frames(n=6, size=384, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, size), dtype=np.uint8)


def test_oma_roundtrip(tmp_path):
    frames = _frames()
    p = tmp_path / "x.oma"
    oma.write(p, frames, oma.CODEC_ATRAC3, 384, joint_stereo=False)
    got, info = oma.read(p)
    assert (got == frames).all()
    assert info == {"codec": 0, "sample_rate": 44100, "joint_stereo": False,
                    "frame_size": 384, "channels": 2}
    header = p.read_bytes()[:96]
    assert header[:3] == b"EA3" and header[5] == 96
    assert header[6] == 0xFF and header[7] == 0xFF
    # params: codec 0, js 0, sr idx 1 (44100), framesize/8 = 48
    assert struct.unpack(">I", header[32:36])[0] == (1 << 13) | 48


def test_oma_at3plus_params(tmp_path):
    frames = _frames(size=2048)
    p = tmp_path / "x.oma"
    oma.write(p, frames, oma.CODEC_ATRAC3PLUS, 2048, channels=2)
    got, info = oma.read(p)
    assert (got == frames).all()
    assert info["codec"] == 1 and info["frame_size"] == 2048
    assert info["channels"] == 2


def test_riff_at3_header(tmp_path):
    frames = _frames()
    p = tmp_path / "x.at3"
    at3.write_at3(p, frames, 384, joint_stereo=False)
    data = p.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    fmt_tag, channels = struct.unpack("<HH", data[20:24])
    assert fmt_tag == 0x270 and channels == 2
    assert data[52:56] == b"fact"
    total = struct.unpack("<I", data[60:64])[0]
    assert total == 6 * 1024
    assert data[68:72] == b"data"
    assert struct.unpack("<I", data[72:76])[0] == 6 * 384
    assert (np.frombuffer(data[76:], np.uint8).reshape(6, 384)
            == frames).all()


def test_rm_structure(tmp_path):
    frames = _frames(n=7)
    p = tmp_path / "x.rm"
    rm.write(p, frames, 384)
    data = p.read_bytes()
    assert data[:4] == b".RMF"
    assert data[18:22] == b"PROP"
    assert data[68:72] == b"MDPR"
    data_off = 18 + 50 + 168
    assert data[data_off:data_off + 4] == b"DATA"
    # 7 frames -> 3 packet headers (frames 0, 3, 6)
    assert len(data) == data_off + 18 + 7 * 384 + 3 * 12
    # descramble first payload and compare
    payload = np.frombuffer(data, np.uint8,
                            count=384, offset=data_off + 18 + 12)
    key = np.tile(np.array([0x53, 0x7F, 0x61, 0x03], np.uint8), 96)
    assert ((payload ^ key) == frames[0]).all()
