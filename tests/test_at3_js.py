"""ATRAC3 joint-stereo tests: golden cross-validation vs the reference.

Covers the JS bitrate modes (66150 bit/s "LP4", 192-byte frames): M/S
matrixing, the per-frame M/S byte-budget shift, the reversed side-channel
layout, and the mono-input empty side-channel element.
"""
import os

import numpy as np
import pytest

from atracdenc_tpu.models.atrac3 import frame as at3_frame
from atracdenc_tpu.models.atrac3.decoder import decode_track
from atracdenc_tpu.models.atrac3.encoder import encode_track

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden():
    return np.load(os.path.join(GOLDEN, "at3_js_golden.npz"))


def test_js_stereo_byte_identity(golden):
    pcm, ref = golden["pcm_in"], golden["ref_frames"]
    planes = encode_track(pcm, frame_bytes=192, js=True,
                          no_gain_control=False, no_tonal=False)
    ours = at3_frame.pack(planes, 192, js=True)
    ident = (ours == ref).mean()
    assert ident > 0.99, f"byte identity {ident:.4f}"


def test_js_mono_empty_side_channel(golden):
    pcm, ref = golden["pcm_mono"], golden["ref_mono"]
    planes = encode_track(pcm, frame_bytes=192, js=True,
                          no_gain_control=False, no_tonal=False)
    ours = at3_frame.pack(planes, 192, js=True)
    ident = (ours == ref).mean()
    assert ident > 0.85, f"byte identity {ident:.4f}"
    # the side channel element must parse as 1 QMF band, no coded blocks
    parsed = at3_frame.unpack(ours, 1, js=True)
    for chans in parsed:
        side = chans[1]
        assert len(side["gain"]) == 1
        assert side["num_bfu"] == 1 and side["wordlen"][0] == 0


def test_js_decode_roundtrip(golden):
    pcm, _ = golden["pcm_in"], golden["ref_frames"]
    planes = encode_track(pcm, frame_bytes=192, js=True,
                          no_gain_control=False, no_tonal=False)
    frames = at3_frame.pack(planes, 192, js=True)
    dec = decode_track(frames, 2, js=True)
    n = min(dec.shape[1], pcm.shape[1]) - 2048
    x = pcm[:, 1024:n].astype(np.float64)
    e = x - dec[:, 1024:n].astype(np.float64)
    p = 10 * np.log10((x ** 2).mean() / max((e ** 2).mean(), 1e-20))
    assert p > 10.0, f"JS closed-loop PSNR {p:.2f} dB"
