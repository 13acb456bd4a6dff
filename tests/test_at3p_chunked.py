"""AT3P chunked encode must be bit-identical to whole-track encode.

The chunk window carries the PQF FIR history, the GHA envelope chain and
next-frame continuation, the one-frame residual delay, and the MDCT stored
half (reference state carries: src/atrac/at3p/at3p.cpp:89-180); these tests
pin the CHUNK_LEFT/CHUNK_RIGHT context bounds at the byte level.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atracdenc_tpu.models.atrac3p import tables as T
from atracdenc_tpu.models.atrac3p.device_pack import pack_device
from atracdenc_tpu.models.atrac3p.encoder import encode_track

pytestmark = pytest.mark.slow


def _pcm(frames, seed=5):
    t = T.NUM_SAMPLES * frames
    rng = np.random.default_rng(seed)
    n = np.arange(t)
    sig = (0.35 * np.sin(2 * np.pi * 997 * n / 44100)
           + 0.15 * np.sin(2 * np.pi * 3163 * n / 44100)
           + 0.02 * rng.standard_normal(t))
    sig[t // 3: t // 3 + 400] += 0.3 * rng.standard_normal(400)
    return np.stack([sig, 0.8 * sig]).astype(np.float32)


def _bytes(planes, c):
    jp = {k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
              else jnp.asarray(v)) for k, v in planes.items()}
    return np.asarray(jax.device_get(pack_device(jp, c)))


@pytest.mark.parametrize("use_gha", [True, False])
def test_chunked_equals_whole_track(use_gha):
    pcm = _pcm(11)
    whole = encode_track(pcm, use_gha=use_gha, chunk_frames=0)
    chunked = encode_track(pcm, use_gha=use_gha, chunk_frames=4)
    bw = _bytes(whole, 2)
    bc = _bytes(chunked, 2)
    assert bw.shape == bc.shape
    same = (bw == bc).all(axis=1)
    assert same.all(), f"frames differ: {np.where(~same)[0].tolist()}"


def test_chunked_mono_wideband():
    pcm = _pcm(9)[:1]
    whole = encode_track(pcm, use_gha=8 | 7, chunk_frames=0)
    chunked = encode_track(pcm, use_gha=8 | 7, chunk_frames=3)
    assert (_bytes(whole, 1) == _bytes(chunked, 1)).all()
