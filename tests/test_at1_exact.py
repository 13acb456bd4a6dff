"""Bit-exact ATRAC1 ENCODER path vs the reference binary's output.

exact_enc.py replicates the reference encoder's float decision chain; these
tests assert 100% byte identity (not a percentage) on two golden corpora:
the original tone corpus and a stress corpus (noise transient bursts,
clipping, near-silence — exercising short windows, the scale clamp, the
ATH gate and the BFU-shrink loop).  The on-disk AEA replaces the first
encoded frame with a zero dummy (reference: src/aea.cpp:166-183,
TAeaOutput::WriteFrame FirstWrite skip).
"""
import os

import numpy as np
import pytest

from atracdenc_tpu.containers import aea
from atracdenc_tpu.models.atrac1 import frame as at1_frame
from atracdenc_tpu.models.atrac1.exact_enc import encode_track_exact

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _encode_disk_stream(pcm):
    planes = encode_track_exact(pcm)
    merged = {k: np.swapaxes(np.asarray(v), 0, 1).reshape((-1,) + v.shape[2:])
              for k, v in planes.items()}
    ours = at1_frame.pack(merged)
    ours[0] = 0                       # the AEA writer's dummy-for-first swap
    return ours


@pytest.mark.parametrize("pcm_npz,ref_aea,pcm_key", [
    ("at1_golden.npz", "at1_ref.aea", "pcm_in"),
    ("at1_stress_pcm.npz", "at1_stress_ref.aea", "pcm_in"),
])
def test_encode_bit_exact(pcm_npz, ref_aea, pcm_key):
    pcm = np.load(os.path.join(GOLDEN, pcm_npz))[pcm_key]
    ref_frames, ch, _, _ = aea.read(os.path.join(GOLDEN, ref_aea))
    ours = _encode_disk_stream(pcm)
    n = min(ours.shape[0], ref_frames.shape[0])
    neq = int((ours[:n] != ref_frames[:n]).sum())
    assert neq == 0, f"{neq} bytes differ from the reference encoder"
