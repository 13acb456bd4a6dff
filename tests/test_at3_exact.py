"""Bit-exact ATRAC3 ENCODER path vs the reference binary's output.

exact_enc.py replicates the reference encoder's float decision chain
(QMF tree, kissfft MDCT, scaler, lambda bisection with ConsiderEnergyErr,
EA QuantMantisas, CLC/VLC costing, tonal grouping, the full gain-control
layer in exact_gain.py, and joint-stereo M/S matrixing with the byte-budget
shift).  These tests assert 100% byte identity — not a percentage — on
every encoder mode against frames produced by the compiled reference
oracle (tools/oracle):

- plain        (--notonal --nogaincontrol), LP2 384-byte frames
- tonal        (--nogaincontrol), incl. a dense-tonal stress corpus
- default      (gain control + tonal), incl. a 32-frame transient stress
  corpus exercising plateau/sticky/point0 machinery
- joint stereo (66150 bit/s, 192-byte frames, M/S + CalcMSBytesShift),
  stereo and mono inputs

Reference decision chain: src/atrac3denc.cpp, src/atrac/at3/
atrac3_bitstream.cpp, src/transient_detector.cpp:276-482.
"""
import os

import numpy as np
import pytest

from atracdenc_tpu.models.atrac3 import frame as at3_frame
from atracdenc_tpu.models.atrac3.exact_enc import encode_track_exact

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CASES = [
    # (npz, pcm_key, ref_key, frame_bytes, no_tonal, no_gain, js)
    ("at3_golden.npz", "pcm_in", "ref_frames", 384, True, True, False),
    ("at3_tonal_golden.npz", "pcm_in", "ref_frames", 384, False, True, False),
    ("at3_tonal_dense_golden.npz", "pcm_in", "ref_frames", 384, False, True,
     False),
    ("at3_default_golden.npz", "pcm_in", "ref_frames", 384, False, False,
     False),
    ("at3_default_golden.npz", "pcm_stress", "ref_stress", 384, False, False,
     False),
    ("at3_js_golden.npz", "pcm_in", "ref_frames", 192, False, False, True),
    ("at3_js_golden.npz", "pcm_mono", "ref_mono", 192, False, False, True),
]


@pytest.mark.parametrize(
    "npz,pcm_key,ref_key,frame_bytes,no_tonal,no_gain,js", CASES,
    ids=["plain", "tonal", "tonal_dense", "default", "default_stress",
         "js", "js_mono"])
def test_encode_bit_exact(npz, pcm_key, ref_key, frame_bytes,
                          no_tonal, no_gain, js):
    d = np.load(os.path.join(GOLDEN, npz))
    pcm, ref = d[pcm_key], d[ref_key]
    planes = encode_track_exact(pcm, frame_bytes=frame_bytes,
                                no_tonal=no_tonal, no_gain=no_gain, js=js)
    ours = at3_frame.pack(planes, frame_bytes, js=js)
    n = min(ours.shape[0], ref.shape[0])
    neq = int((ours[:n] != ref[:n]).sum())
    assert neq == 0, f"{neq} bytes differ from the reference encoder"
