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
