"""Container READERS vs files written by the reference binary.

tests/golden/ref_c.{raw,oma,at3,rm} are the same 8-frame ATRAC3 encode
(132300 bps, default mode) written by the reference's own container
writers (tools/oracle: `oracle at3enc ... <oma|riff|rm|raw>`); ref_js.oma
is a 66150 bps joint-stereo encode.  Our readers must recover the exact
frame payload bytes and the stream parameters from each.  The .rm file has
8 frames = 2 full 3-frame media packets + one SHORT final packet, so the
reference's partial-packet tail is exercised.
"""
import os

import numpy as np
import pytest

from atracdenc_tpu.containers import aea, at3, oma, rm

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def raw_frames():
    data = np.fromfile(os.path.join(GOLDEN, "ref_c.raw"), np.uint8)
    return data.reshape(-1, 384)


def test_oma_reader_vs_reference_writer(raw_frames):
    frames, info = oma.read(os.path.join(GOLDEN, "ref_c.oma"))
    assert info["codec"] == oma.CODEC_ATRAC3
    assert info["frame_size"] == 384 and info["channels"] == 2
    assert not info["joint_stereo"]
    assert np.array_equal(frames, raw_frames)


def test_riff_reader_vs_reference_writer(raw_frames):
    frames, info = at3.read(os.path.join(GOLDEN, "ref_c.at3"))
    assert info["codec"] == "atrac3"
    assert info["frame_size"] == 384 and info["channels"] == 2
    assert not info["joint_stereo"]
    assert info["total_samples"] == raw_frames.shape[0] * 1024
    assert np.array_equal(frames, raw_frames)


def test_rm_reader_vs_reference_writer(raw_frames):
    frames, info = rm.read(os.path.join(GOLDEN, "ref_c.rm"))
    assert info["frame_size"] == 384
    assert not info["joint_stereo"]
    assert np.array_equal(frames, raw_frames)


def test_oma_reader_joint_stereo_params():
    frames, info = oma.read(os.path.join(GOLDEN, "ref_js.oma"))
    assert info["codec"] == oma.CODEC_ATRAC3
    assert info["frame_size"] == 192
    assert info["joint_stereo"]
    assert frames.shape[1] == 192


def test_reference_containers_decode():
    """The reference-written streams decode through our QA decoder."""
    from atracdenc_tpu.models.atrac3.decoder import decode_track

    frames, info = oma.read(os.path.join(GOLDEN, "ref_c.oma"))
    pcm = decode_track(frames, channels=2, js=info["joint_stereo"])
    assert pcm.shape[0] == 2
    assert float(np.abs(pcm).max()) > 0.01


def test_rm_zero_size_chunk_raises_not_hangs():
    """A corrupt chunk size of 0 must raise, not spin the chunk walk
    forever (regression: pos += 0)."""
    import struct
    import numpy as np
    import pytest
    from atracdenc_tpu.containers import rm

    frames = np.zeros((3, 192), np.uint8)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.rm")
        rm.write(p, frames, 192)
        blob = bytearray(open(p, "rb").read())
        # zero out the PROP chunk's size field (first chunk after .RMF)
        pos = blob.index(b"PROP")
        blob[pos + 4:pos + 8] = struct.pack(">I", 0)
        bad = os.path.join(d, "bad.rm")
        open(bad, "wb").write(bytes(blob))
        with pytest.raises(ValueError, match="size 0"):
            rm.read(bad)


def test_rm_bogus_frame_size_raises():
    import struct
    import numpy as np
    import pytest
    from atracdenc_tpu.containers import rm

    frames = np.zeros((3, 192), np.uint8)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.rm")
        rm.write(p, frames, 192)
        blob = bytearray(open(p, "rb").read())
        # RA5 codec data: frame size lives 48 bytes into the blob
        pos = blob.index(b".ra\xfd") - 4
        blob[pos + 48:pos + 50] = struct.pack(">H", 0)
        bad = os.path.join(d, "bad.rm")
        open(bad, "wb").write(bytes(blob))
        with pytest.raises(ValueError, match="frame size"):
            rm.read(bad)
