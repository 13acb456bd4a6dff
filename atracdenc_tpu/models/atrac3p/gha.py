"""ATRAC3+ GHA tonal model: sinusoid extraction, synthesis, residual.

The reference delegates sinusoid estimation to the libgha submodule (absent
from its own tree) and wraps it in a round-based accept/refine protocol
(src/atrac/at3p/at3p_gha.cpp).  This is a from-scratch implementation with
the same wire model (TAt3PGhaData: quantized {FreqIndex, AmpSf, PhaseIndex}
per wave, <=8 tone subbands) built for batch execution:

  * extraction: per (channel, frame, subband) greedy rounds on a zero-padded
    2048-point rFFT — the padded bin grid IS the 10-bit FreqIndex grid, so
    peak picking lands directly on quantized frequencies; amplitude/phase
    come from the peak bin and are quantized to the 6-bit scale-factor
    ladder 2^((sf-3)/4) and the 5-bit phase grid;
  * synthesis matches the real decoder bit-for-bit in structure
    (ff_atrac3p_generate_tones, atrac3plusdsp.c:77-204, amplitude mode 1,
    whole-frame envelopes): region-1 waves continue the previous frame's
    phase, region-2 waves anchor their quantized phase at the *end* of their
    frame, and the two regions crossfade under the 256-point Hann window;
  * the residual handed to the MDCT subtracts exactly what a decoder will
    add back.
"""
import jax
import jax.numpy as jnp
import numpy as np

from . import tables as T

NUM_TONE_SUBBANDS = 8       # the reference analyzes subbands 0..7
MAX_WAVES = 8               # greedy rounds per subband (wire allows 15)
_ACCEPT_RATIO = 0.9         # keep a tone only if it removes >=10% of energy
_MIN_AMP = 2.0 ** ((0 - 3) / 4.0)   # smallest representable amplitude


def _quantize_wave(amp, phi_steps, freq):
    """Quantize (amplitude, phase-in-steps-at-frame-start, freq bin)."""
    sf = jnp.clip(jnp.round(4.0 * jnp.log2(jnp.maximum(amp, 1e-20)) + 3.0),
                  0, 63).astype(jnp.int32)
    amp_q = 2.0 ** ((sf.astype(jnp.float32) - 3.0) / 4.0)
    # the 5-bit phase anchors at the frame end: DEQ(ph) - 128*inc == phase
    # at the frame's own sample 0 (atrac3plusdsp.c:94)
    ph = jnp.round((phi_steps + 128.0 * freq) / 64.0).astype(jnp.int32) & 31
    return sf, amp_q, ph


def _wave_value(freq, ph, i_offset):
    """sin table phase positions for samples i=0..127 with the decoder's
    integer phase arithmetic; i_offset = 0 (region 1) or -128 (region 2)."""
    i = jnp.arange(128)
    pos = ((ph << 6) + (i + i_offset) * freq) & 2047
    return jnp.sin(2.0 * np.pi * pos.astype(jnp.float32) / 2048.0)


def extract(bands):
    """Greedy sinusoid extraction.

    bands: [C, F, 16, 128] PQF band samples (content frames).
    Returns planes over the tone subbands:
      freq [C, F, 8, MAX_WAVES] int32, amp_sf [...], phase [...],
      valid [C, F, 8, MAX_WAVES] bool.
    """
    batch = bands.shape[:-2]
    x = bands[..., :NUM_TONE_SUBBANDS, :].reshape((-1, 128))  # 2-D lanes

    i128 = jnp.arange(128)
    bins_mask = (jnp.arange(1025) >= 1) & (jnp.arange(1025) <= 1023)

    def round_fn(k, carry):
        x, freq, sf, ph, valid = carry
        spec = jnp.fft.rfft(x, n=2048)              # [L, 1025]
        mag = jnp.where(bins_mask, jnp.abs(spec), 0.0)
        b = jnp.argmax(mag, axis=-1).astype(jnp.int32)
        peak = jnp.take_along_axis(spec, b[:, None], axis=-1)[:, 0]
        amp = 2.0 * jnp.abs(peak) / 128.0
        # x ~ A sin(w i + phi): phi = angle(X) + pi/2
        phi = jnp.angle(peak) + np.pi / 2.0
        phi_steps = jnp.mod(phi * (2048.0 / (2.0 * np.pi)), 2048.0)

        sf_k, amp_q, ph_k = _quantize_wave(amp, phi_steps,
                                           b.astype(jnp.float32))
        pos = ((ph_k[:, None] << 6) + (i128 - 128) * b[:, None]) & 2047
        tone = amp_q[:, None] * jnp.sin(
            2.0 * np.pi * pos.astype(jnp.float32) / 2048.0)

        e_old = jnp.sum(x * x, axis=-1)
        resid = x - tone
        e_new = jnp.sum(resid * resid, axis=-1)
        accept = (e_new < e_old * _ACCEPT_RATIO) & (amp >= _MIN_AMP)

        x = jnp.where(accept[:, None], resid, x)
        freq = freq.at[:, k].set(jnp.where(accept, b, 0))
        sf = sf.at[:, k].set(jnp.where(accept, sf_k, 0))
        ph = ph.at[:, k].set(jnp.where(accept, ph_k, 0))
        valid = valid.at[:, k].set(accept)
        return x, freq, sf, ph, valid

    lanes = x.shape[0]
    init = (x, jnp.zeros((lanes, MAX_WAVES), jnp.int32),
            jnp.zeros((lanes, MAX_WAVES), jnp.int32),
            jnp.zeros((lanes, MAX_WAVES), jnp.int32),
            jnp.zeros((lanes, MAX_WAVES), bool))
    _, freq, sf, ph, valid = jax.lax.fori_loop(0, MAX_WAVES, round_fn, init)
    out_shape = batch + (NUM_TONE_SUBBANDS, MAX_WAVES)
    return {"freq": freq.reshape(out_shape), "amp_sf": sf.reshape(out_shape),
            "phase": ph.reshape(out_shape), "valid": valid.reshape(out_shape)}


def _synth_region(planes, region_offset):
    """Sum of quantized waves per (C, F, 8) band frame; region_offset 0 for
    region 1 (continuation), -128 for region 2 (own frame)."""
    freq = planes["freq"]
    ph = planes["phase"]
    amp = 2.0 ** ((planes["amp_sf"].astype(jnp.float32) - 3.0) / 4.0)
    amp = jnp.where(planes["valid"], amp, 0.0)
    i = jnp.arange(128)
    pos = ((ph[..., None] << 6)
           + (i + region_offset) * freq[..., None]) & 2047
    waves = amp[..., None] * jnp.sin(
        2.0 * np.pi * pos.astype(jnp.float32) / 2048.0)
    return jnp.sum(waves, axis=-2)                  # [..., 8, 128]


def subtract(bands, planes):
    """Residual = bands minus the decoder's crossfaded tone synthesis.

    bands [C, F, 16, 128]; planes from extract() (per content frame).
    """
    hann = (1.0 - jnp.cos(2.0 * np.pi * jnp.arange(256) / 256.0)) * 0.5
    rise, fall = hann[:128], hann[128:]

    reg2 = _synth_region(planes, -128)              # own frame's waves
    reg1 = _synth_region(planes, 0)                 # continuation into next
    reg1_prev = jnp.pad(reg1[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    synth = fall * reg1_prev + rise * reg2
    res_tone_bands = bands[..., :NUM_TONE_SUBBANDS, :] - synth
    return jnp.concatenate(
        [res_tone_bands, bands[..., NUM_TONE_SUBBANDS:, :]], axis=-2)


def synthesize_for_decode(planes):
    """Decoder-side tone signal per output frame (QA decoder): the planes
    here are already in output-frame alignment (waves of content frame f-1
    live at output frame f, like the coded residual)."""
    hann = (1.0 - jnp.cos(2.0 * np.pi * jnp.arange(256) / 256.0)) * 0.5
    rise, fall = hann[:128], hann[128:]
    reg2 = _synth_region(planes, -128)
    reg1 = _synth_region(planes, 0)
    reg1_prev = jnp.pad(reg1[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    return fall * reg1_prev + rise * reg2           # [C, F, 8, 128]
