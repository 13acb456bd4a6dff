"""AT3P on-device serialization vs the host packer (byte-identity)."""
import numpy as np
import jax.numpy as jnp
import pytest


def _tonal_pcm(seconds=0.6, channels=2):
    sr = 44100
    t = np.arange(int(sr * seconds))
    x = (0.5 * np.sin(2 * np.pi * 689.0625 * t / sr)
         + 0.2 * np.sin(2 * np.pi * 3000.5 * t / sr))
    # an onset midway exercises envelopes
    x[: t.size // 2] *= 0.05
    x = x + 0.01 * np.random.default_rng(0).standard_normal(t.size)
    pcm = np.stack([x, 0.8 * x])[:channels]
    return np.clip(pcm, -1, 1).astype(np.float32)


@pytest.mark.parametrize("channels,use_gha", [(2, True), (1, True),
                                              (2, False)])
def test_at3p_pack_device_byte_identity(channels, use_gha):
    from atracdenc_tpu.models.atrac3p import frame as at3p_frame
    from atracdenc_tpu.models.atrac3p.encoder import encode_track
    from atracdenc_tpu.models.atrac3p.device_pack import pack_device

    pcm = _tonal_pcm(channels=channels)
    planes = encode_track(pcm, use_gha=use_gha)
    ref = at3p_frame.pack(planes, channels)
    dev_planes = {k: (jnp.asarray(v) if not isinstance(v, dict)
                      else {kk: jnp.asarray(vv) for kk, vv in v.items()})
                  for k, v in planes.items()}
    dev = np.asarray(pack_device(dev_planes, channels))
    assert ref.shape == dev.shape
    diff = int((ref != dev).sum())
    assert diff == 0, f"{diff}/{ref.size} bytes differ"


def test_tonal_bits_device_equals_host_walk():
    """The numQU shrink budgets with the device plane-wise tonal-bit cost
    (_tonal_bits_fn); a bug there would shrink to a wrong numQU that BOTH
    packers would then consume, so byte identity alone cannot catch it —
    pin it against the per-frame host walk (WriteTonalBlock dry run)."""
    from atracdenc_tpu.models.atrac3p import encoder as E

    pcm = _tonal_pcm(seconds=0.6, channels=2)
    planes = E.encode_track(pcm, use_gha=True)
    tones = planes["tones"]
    dev = np.asarray(E._tonal_bits_fn(2)(
        {k: jnp.asarray(v) for k, v in tones.items()}), np.int64)
    host = E._tonal_section_bits(tones, 2)
    assert dev.shape == host.shape
    assert np.array_equal(dev, host)
    assert host.sum() > 0, "corpus produced no tonal blocks - test is vacuous"


@pytest.mark.parametrize("channels", [2, 1])
def test_fused_bytes_path_equals_host_tail(channels):
    """encode_frames_bytes (device finish: tone wire ordering + tonal
    budget + numQU shrink in-graph) must produce the same frame bytes as
    the host tail (_finish_planes + pack_device)."""
    import jax
    from atracdenc_tpu.models.atrac3p import encoder as E
    from atracdenc_tpu.models.atrac3p.device_pack import pack_device

    pcm = _tonal_pcm(channels=channels)
    pad = (-pcm.shape[1]) % 2048
    pcm = np.pad(pcm, ((0, 0), (0, pad)))
    fused = np.asarray(E.encode_frames_bytes(jnp.asarray(pcm), channels,
                                             gha_mask=7))
    core = E._encode_core(jnp.asarray(pcm), gha_mask=7)
    planes = E._finish_planes(core, channels)
    jp = {k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
              else jnp.asarray(v)) for k, v in planes.items()}
    ref = np.asarray(pack_device(jp, channels))
    assert fused.shape == ref.shape
    diff = int((fused != ref).sum())
    assert diff == 0, f"{diff}/{ref.size} bytes differ"
