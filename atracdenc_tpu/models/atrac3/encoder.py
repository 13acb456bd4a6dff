"""ATRAC3 encoder: whole-track, batched, jit-compiled.

Pipeline per channel (reference call stack: src/atrac3denc.cpp:679-867):
  QMF analysis (4 bands) -> [gain control] -> windowed MDCT with gain
  modulation -> loudness tracking (scan) -> [tonal extraction] ->
  block-floating scale -> lambda-bisection bit allocation -> mantissas.
Output is a set of fixed-shape integer planes; host code (frame.py)
serializes them into the fixed-size sound units.

The one-frame lookahead of the reference (LOOK_AHEAD priming,
atrac3denc.cpp:715-718) exists only because of its streaming gain analysis
window; in whole-track form every frame sees its neighbors directly.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from atracdenc_tpu.ops import psy, scale as scale_ops
from . import tables as T
from . import filterbank
from . import tonal
from . import gain
from .mdct import mdct_frames, gain_divisors, first_level_scale
from .bitalloc import quant_tensors, allocate

_LOUD_CURVE = jnp.asarray(psy.create_loudness_curve(1024))
_GATHER_IDX = jnp.asarray(T.GATHER_IDX)
_GATHER_MASK = jnp.asarray(T.GATHER_MASK)
_SCALE_TABLE = jnp.asarray(T.SCALE_TABLE)


def band_frames(pcm):
    """[C, T] PCM -> [C, F, 4, 256] band samples (input scaled by 1/4,
    reference atrac3denc.cpp:703-705)."""
    c, t = pcm.shape
    f = t // T.NUM_SAMPLES
    bands = filterbank.analysis(pcm * 0.25)          # [C, 4, T/4]
    return jnp.swapaxes(bands.reshape(c, 4, f, 256), 1, 2)


def gather_bfu_blocks(specs):
    """[..., 1024] spectra -> padded BFU blocks [..., 32, 128]."""
    flat = _GATHER_IDX.reshape(-1)
    vals = jnp.take_along_axis(
        specs, jnp.broadcast_to(flat, specs.shape[:-1] + flat.shape), axis=-1)
    return vals.reshape(specs.shape[:-1] + (T.MAX_BFUS, 128)) * _GATHER_MASK


def spread_from_sfi(sfi):
    """AnalizeScaleFactorSpread over all 32 blocks
    (atrac_psy_common.cpp:101-124)."""
    mean = jnp.mean(sfi.astype(jnp.float32), axis=-1)
    var = jnp.mean((sfi - mean[..., None]) ** 2, axis=-1)
    return jnp.minimum(jnp.sqrt(var), 14.0) / 14.0


@partial(jax.jit, static_argnames=("frame_bytes", "js", "no_gain_control",
                                   "no_tonal", "bfu_idx_const"))
def encode_frames(pcm, frame_bytes=384, js=False, no_gain_control=True,
                  no_tonal=True, bfu_idx_const=0):
    """Encode [C, T] PCM (T multiple of 1024) into ATRAC3 frame planes.

    Gain control and tonal components are staged in follow-up commits; the
    current planes match the reference's --nogaincontrol --notonal mode.

    Returns dict of planes (per channel, per frame):
      num_bfu [C, F], coding_mode [C, F] (1 = CLC), wordlen [C, F, 32],
      sfi [C, F, 32], mant [C, F, 32, 128], gain_npoints [C, F, 4],
      gain_levels/gain_locs [C, F, 4, 8], loudness [F].
    """
    c, t = pcm.shape
    f = t // T.NUM_SAMPLES

    bands = band_frames(pcm)                         # [C, F, 4, 256]
    if js and c == 2:
        # M/S matrixing in the band-sample domain (atrac3denc.cpp:665-677;
        # M/S is linear, so matrixing the whole stream equals matrixing the
        # reference's per-frame buffers and gain-analysis windows)
        bands = jnp.stack([(bands[0] + bands[1]) * 0.5,
                           (bands[0] - bands[1]) * 0.5])

    if no_gain_control:
        # empty gain curves (SubbandInfo with 4 bands, 0 points each)
        gain_npoints = jnp.zeros((c, f, 4), jnp.int32)
        gain_levels = jnp.zeros((c, f, 4, 8), jnp.int32)
        gain_locs = jnp.zeros((c, f, 4, 8), jnp.int32)
        gain_scale_frame = jnp.ones((c, f, 4), jnp.float32)
        specs = mdct_frames(bands)                   # [C, F, 1024]
    else:
        gain_levels, gain_locs, gain_npoints = gain.gain_control(bands)
        div = gain_divisors(gain_levels, gain_locs, gain_npoints)
        scale = first_level_scale(gain_levels, gain_npoints)
        gain_scale_frame = gain.energy_scale(bands, div, scale)
        specs = mdct_frames(bands, div, scale)

    # loudness IIR (atrac3denc.cpp:811-841): stereo non-JS averages both
    # channels; mono and JS use channel 0 only.
    gs_per_line = jnp.repeat(gain_scale_frame, 256, axis=-1)    # [C, F, 1024]
    frame_loud = jnp.sum(specs * specs * gs_per_line * _LOUD_CURVE,
                         axis=-1)                               # [C, F]
    if c == 2 and not js:
        loud = psy.track_loudness_scan(
            frame_loud[0], frame_loud[1], jnp.ones((f,), bool),
            jnp.zeros((f,), bool), T.LOUD_FACTOR)
    else:
        loud = psy.track_loudness_scan(
            frame_loud[0], jnp.zeros((f,)), jnp.zeros((f,), bool),
            jnp.ones((f,), bool), T.LOUD_FACTOR)
    loudness = loud / T.LOUD_FACTOR                  # [F], shared by channels

    # tonal component extraction (atrac3denc.cpp:822-827); flatness and
    # loudness both use the pre-extraction spectrum
    if no_tonal:
        tonal_planes = None
        tonal_counts = None
        tonal_bits_fn = None
    else:
        flat = tonal.flatness_per_bfu(specs * specs)
        specs, tp = tonal.extract(specs, flat)
        tonal_planes = tonal.scale_groups(tp)
        tonal_counts = tonal_planes["active"].astype(jnp.int32)
        tonal_bits_fn = tonal.make_cost_fn(tonal_planes)

    blocks = gather_bfu_blocks(specs)                # [C, F, 32, 128]
    sfi, scaled, energy = scale_ops.scale_blocks(
        blocks, _GATHER_MASK, _SCALE_TABLE)
    spread = spread_from_sfi(sfi)

    # per-channel bit budget (WriteSoundUnit, atrac3_bitstream.cpp:830-892):
    # halfFrameSz*8 - 6 (numBlocks+codingMode) - header/gain-info bits;
    # the JS channel-1 header is the 14-bit WriteJsParams block
    half = frame_bytes // 2
    id_bits = jnp.asarray([14 if (js and ch == 1) else 6 for ch in range(c)]
                          )[:, None]
    header_bits = id_bits + 2 + jnp.sum(3 + gain_npoints * 9, axis=-1)

    if js:
        # M/S byte-budget shift from per-frame loudness (CalcMSBytesShift,
        # atrac3_bitstream.cpp:800-828); a mono input's empty side channel
        # gets the minimum budget (shift = maxAllowedShift)
        h1 = header_bits[1] if c == 2 else 14 + 2 + 3
        total_used = 12 + header_bits[0] + h1
        max_shift = half - (1 + (total_used - 1) // 8)
        if c == 2:
            total_loud = frame_loud[0] + frame_loud[1]
            ratio = jnp.where(total_loud > 0,
                              frame_loud[0] / total_loud - 0.5, 0.0)
            ms_shift = jnp.clip(
                jnp.round(frame_bytes * ratio).astype(jnp.int32),
                -max_shift, max_shift)
        else:
            ms_shift = jnp.broadcast_to(max_shift, (f,)).astype(jnp.int32)
    else:
        ms_shift = jnp.zeros((f,), jnp.int32)
    shift_per_ch = jnp.stack([ms_shift, -ms_shift])[:c]
    target = jnp.maximum(
        8 * (half + shift_per_ch) - 6 - header_bits, 1).astype(jnp.int32)

    qt = quant_tensors(scaled, _GATHER_MASK)
    num_bfu, mode, wl = allocate(
        qt, sfi, gain_scale_frame, energy, spread,
        jnp.broadcast_to(loudness, (c, f)), target,
        tonal_counts=tonal_counts, tonal_bits_fn=tonal_bits_fn,
        bfu_idx_const=bfu_idx_const)

    # int8: |mantissa| <= 31, and the plane is the bulk of the host transfer;
    # one-hot contraction instead of a small-axis gather (slow on TPU)
    oh = jax.nn.one_hot(wl, 8, dtype=jnp.int8)
    mant = jnp.sum(qt["mant"].astype(jnp.int8) * oh[..., None],
                   axis=-2).astype(jnp.int8)

    # compact dtypes: the planes cross the device->host link
    out = {
        "num_bfu": num_bfu.astype(jnp.int8),
        "coding_mode": mode,
        "wordlen": wl.astype(jnp.int8),
        "sfi": sfi.astype(jnp.int8),
        "mant": mant,
        "gain_npoints": gain_npoints.astype(jnp.int8),
        "gain_levels": gain_levels.astype(jnp.int8),
        "gain_locs": gain_locs.astype(jnp.int8),
        "loudness": loudness,
        "ms_shift": ms_shift,
    }
    if tonal_planes is not None:
        active = tonal_planes["active"] & (
            jnp.arange(T.MAX_BFUS) < num_bfu[..., None])
        quant = jnp.clip(jnp.where(active, wl + 4, 0), 2, 7)
        out["tonal_active"] = active
        out["tonal_start"] = tonal_planes["start"].astype(jnp.int16)
        out["tonal_len"] = tonal_planes["len"].astype(jnp.int8)
        out["tonal_sfi"] = tonal_planes["sfi"].astype(jnp.int8)
        out["tonal_quant"] = jnp.where(active, quant, 0).astype(jnp.int8)
        ohq = jax.nn.one_hot(quant, 8, dtype=jnp.int8)
        out["tonal_mant"] = jnp.sum(
            tonal_planes["mant"].astype(jnp.int8) * ohq[..., None],
            axis=-2).astype(jnp.int8)
    return out


def encode_track(pcm: np.ndarray, frame_bytes=384, js=False,
                 no_gain_control=True, no_tonal=True, bfu_idx_const=0):
    """NumPy convenience wrapper: pads to a whole number of frames."""
    pcm = np.atleast_2d(np.asarray(pcm, np.float32))
    c, t = pcm.shape
    pad = (-t) % T.NUM_SAMPLES
    if pad:
        pcm = np.pad(pcm, ((0, 0), (0, pad)))
    import jax
    planes = encode_frames(jnp.asarray(pcm), frame_bytes=frame_bytes, js=js,
                           no_gain_control=no_gain_control, no_tonal=no_tonal,
                           bfu_idx_const=bfu_idx_const)
    return jax.device_get(planes)
