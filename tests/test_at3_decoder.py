"""ATRAC3 QA decoder tests (new capability: reference decodes only ATRAC1).

The decoder closes the loop on encoder output the way the reference project
uses external decoders (SURVEY.md §4): encoder quality parity is asserted by
decoding both the reference oracle's frames and ours with the same decoder.
"""
import os

import numpy as np
import pytest

from atracdenc_tpu.models.atrac3 import frame as at3_frame
from atracdenc_tpu.models.atrac3.decoder import decode_track
from atracdenc_tpu.models.atrac3.encoder import encode_track

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _psnr(x, y):
    e = x - y
    return 10 * np.log10((x ** 2).mean() / max((e ** 2).mean(), 1e-20))


@pytest.fixture(scope="module")
def golden():
    data = np.load(os.path.join(GOLDEN, "at3_golden.npz"))
    return data["pcm_in"], data["ref_frames"]


def test_quality_parity_with_reference(golden):
    pcm, ref_frames = golden
    ours = at3_frame.pack(encode_track(pcm, frame_bytes=384), 384)
    dec_ref = decode_track(ref_frames, 2)
    dec_ours = decode_track(ours, 2)
    n = min(dec_ref.shape[1], pcm.shape[1]) - 2048
    x = pcm[:, 1024:n].astype(np.float64)
    p_ref = _psnr(x, dec_ref[:, 1024:n].astype(np.float64))
    p_ours = _psnr(x, dec_ours[:, 1024:n].astype(np.float64))
    assert p_ours > p_ref - 0.05, f"ours {p_ours:.2f} dB vs ref {p_ref:.2f} dB"


def test_closed_loop_sine():
    t = 1024 * 8
    n = np.arange(t)
    pcm = np.stack([0.5 * np.sin(2 * np.pi * 997 * n / 44100),
                    0.5 * np.sin(2 * np.pi * 440 * n / 44100)]
                   ).astype(np.float32)
    frames = at3_frame.pack(encode_track(pcm, frame_bytes=384), 384)
    dec = decode_track(frames, 2)
    m = min(dec.shape[1], t) - 2048
    p = _psnr(pcm[:, 1024:m].astype(np.float64),
              dec[:, 1024:m].astype(np.float64))
    assert p > 30.0, f"closed-loop PSNR {p:.2f} dB"
