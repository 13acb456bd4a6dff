"""ATRAC3+ QA decoder (new capability — the reference has no AT3P decoder).

Parse frames -> dequantize -> per-subband IMDCT -> inverse PQF.  Closes the
loop on encoder output; the reference relies on external decoders
(SURVEY.md §4).
"""
import numpy as np
import jax.numpy as jnp

from . import tables as T
from . import frame as at3p_frame
from . import pqf
from . import gha
from .mdct import imdct_frames

# one-frame encoder look-ahead + one-frame MDCT OLA latency + PQF delay
DELAY = 2 * T.NUM_SAMPLES + pqf.PQF_DELAY_SAMPLES


def decode_track(frames: np.ndarray, channels: int) -> np.ndarray:
    """[N, 2048] frames -> [C, T] PCM (delay-compensated)."""
    n = frames.shape[0]
    specs = np.zeros((channels, n, 2048), np.float32)
    tones = {"freq": np.zeros((channels, n, 8, 15), np.int32),
             "amp_sf": np.zeros((channels, n, 8, 15), np.int32),
             "phase": np.zeros((channels, n, 8, 15), np.int32),
             "valid": np.zeros((channels, n, 8, 15), bool),
             "env_start": np.full((channels, n, 8), -1, np.int32),
             "env_stop": np.full((channels, n, 8), -1, np.int32)}
    any_tones = False
    for fi in range(n):
        p = at3p_frame.unpack_frame(frames[fi], channels)
        for ch in range(channels):
            for qu in range(p["num_qu"]):
                wl = p["wordlen"][ch, qu]
                if wl == 0:
                    continue
                s, ln = T.SPECS_START[qu], T.SPECS_PER_BLOCK[qu]
                specs[ch, fi, s:s + ln] = (
                    p["mant"][ch, qu, :ln] * T.MANT_TAB[wl]
                    * T.SCALE_TABLE[p["sfi"][ch, qu]])
        if p["tones"] is not None:
            any_tones = True
            for k in tones:
                tones[k][:, fi] = p["tones"][k]

    bands = np.asarray(imdct_frames(jnp.asarray(specs)))  # [C, N, 16, 128]
    bands = bands / T.RESIDUAL_SCALE
    if any_tones:
        synth = np.asarray(gha.synthesize(
            {k: jnp.asarray(v) for k, v in tones.items()}))
        # imdct_frames out[b] is content frame b-2 (coded-frame OLA latency
        # + the encoder's residual delay); wire block f carries content
        # frame f-1's waves, so content b-2 = fall*wire[b-1] + rise*wire[b]
        # = synthesize(wire)[b-1]
        bands[:, 1:, :gha.NUM_TONE_SUBBANDS, :] += synth[:, :-1]
    stream = np.swapaxes(bands, 1, 2).reshape(channels, 16, -1)
    pcm = np.stack([pqf.ipqf_np(stream[ch]) for ch in range(channels)])
    # non-finite values from corrupt input decode as silence (the int16
    # writer must never see NaN/inf)
    return np.clip(np.nan_to_num(pcm[:, pqf.PQF_DELAY_SAMPLES:],
                                 nan=0.0, posinf=1.0, neginf=-1.0),
                   -1.0, 1.0)
