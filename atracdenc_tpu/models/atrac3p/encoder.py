"""ATRAC3+ encoder: whole-track, batched.

Pipeline (reference: src/atrac/at3p/at3p.cpp:89-180):
  16-band PQF analysis -> [GHA tonal model] -> one-frame-delayed residual,
  scaled by 1/(32768/1.122018) -> per-subband MDCT -> block-floating scale ->
  fixed per-QU wordlens -> mantissa quantization -> best-of-8 spectrum VLC
  table per quant unit -> NumQuantUnits shrink until the 2048-byte frame fits.

The reference's one-frame look-ahead (LOOK_AHEAD + drain) makes the first
output frame silent and drops the final content frame; the whole-track form
reproduces that by shifting the residual stream one frame right.

The GHA tonal model is staged separately; without it the residual equals the
PQF output (equivalent to a GHA pass that detects no tones), which is a
complete, valid ATRAC3+ stream.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from atracdenc_tpu.ops import scale as scale_ops
from . import tables as T
from . import pqf
from . import gha
from .mdct import mdct_frames

_GATHER_IDX = jnp.asarray(T.GATHER_IDX)
_GATHER_MASK = jnp.asarray(T.GATHER_MASK)
_SCALE_TABLE = jnp.asarray(T.SCALE_TABLE)
_SPEC_LEN = jnp.asarray(T.SPEC_LEN)


def band_frames(pcm):
    """[C, T] PCM -> [C, F, 16, 128] PQF band samples."""
    c, t = pcm.shape
    f = t // T.NUM_SAMPLES
    bands = pqf.analysis(pcm)                 # [C, 16, T/16]
    return jnp.swapaxes(bands.reshape(c, 16, f, 128), 1, 2)


def gather_qu_blocks(specs):
    """[..., 2048] spectra -> padded QU blocks [..., 32, 128]."""
    flat = _GATHER_IDX.reshape(-1)
    vals = jnp.take_along_axis(
        specs, jnp.broadcast_to(flat, specs.shape[:-1] + flat.shape), axis=-1)
    return vals.reshape(specs.shape[:-1] + (32, 128)) * _GATHER_MASK


def _qu_table_cost(mant, qu, tab_idx):
    """Spectrum bits for one QU at one table (EncodeQuSpectra dry run,
    at3p_bitstream.cpp:286-345). mant: [..., L]."""
    gs, nc, bits, signed = (int(x) for x in T.SPECTRA_TABS[tab_idx])
    ln = int(T.SPECS_PER_BLOCK[qu])
    m = mant[..., :ln]
    ncodes = ln // nc
    grp = m.reshape(m.shape[:-1] + (ncodes, nc))
    if signed:
        t = grp & ((1 << bits) - 1)
        sign_bits = 0
    else:
        t = jnp.abs(grp)
        sign_bits = jnp.sum((grp != 0).astype(jnp.int32), axis=(-1, -2))
    shifts = (bits * np.arange(nc)).astype(np.int32)
    val = jnp.sum(t << shifts, axis=-1)       # [..., ncodes]
    code_bits = jnp.sum(_SPEC_LEN[tab_idx, val], axis=-1)
    group_bits = 0 if gs == 1 else ncodes // gs
    return code_bits + sign_bits + group_bits


def _wordlen_section_bits():
    """[33] bits of the ch0 wordlen section per numQU (the wordlens are the
    fixed table, so the section cost is a constant per numQU;
    TWordLenEncoder, at3p_bitstream.cpp:156-247)."""
    out = np.zeros(33, np.int64)
    wl = T.FIXED_WORDLEN
    for nq in range(1, 33):
        deltas = np.diff(wl[:nq])
        max_d = int(np.abs(deltas).max(initial=0))
        if max_d >= 3:
            rng = (2, 3)
        elif max_d == 2:
            rng = (1, 1)
        else:
            rng = (0, 0)
        best = min(range(rng[0], rng[1] + 1),
                   key=lambda i: T.WL_LEN[i][deltas & 7].sum())
        bits = 2 + 2 + 2 + 2 + 3 + int(T.WL_LEN[best][deltas & 7].sum())
        out[nq] = bits
    return out


_WL_BITS_CH0 = _wordlen_section_bits()
# inter-channel deltas are all zero (both channels share the fixed table):
# header 2+2+2 bits + numQU codes from table 0 for delta 0
_WL_BITS_CH1 = 6 + T.WL_LEN[0][0] * np.arange(33)


def _const_bits(channels):
    """[33] per-numQU section bits that don't depend on the spectra."""
    nq = np.arange(33)
    bits = np.zeros(33, np.int64)
    bits += 5 + 1                                   # TConfigure
    bits += _WL_BITS_CH0
    if channels == 2:
        bits += _WL_BITS_CH1
    bits += channels * (2 + 6 * nq)                 # TSfIdx
    bits += 1 + channels * (1 + 2 + 1 + 3 * nq)     # EncodeCodeTab (full table)
    pwr = T.SUBBAND_TO_NUM_POWGRPS[T.QU_TO_SUBBAND[np.maximum(nq, 1) - 1]]
    bits += channels * 4 * pwr                      # power-comp stubs
    if channels == 2:
        bits += 2                                   # swap/negate flags
    bits += channels * 1                            # window shape (all sine)
    bits += channels * 1                            # gain comp
    bits += 1                                       # no tonal block
    bits += 1 + 2                                   # no noise + terminator
    return bits


@partial(jax.jit, static_argnames=("gha_mask", "wb_refine"))
def _encode_core(pcm, gha_mask=7, wb_refine=None):
    """gha_mask: None = GHA disabled (plain transform, equivalent to a GHA
    pass that finds no tones); else the reference's --advanced ghadbg bitmask
    (atrac3p.h:29-43): 1 = GHA_PASS_INPUT (code the residual input; clear ->
    the transform path sees silence), 2 = GHA_WRITE_TONAL (tonal block on the
    wire), 4 = GHA_WRITE_RESIUDAL (spectra on the wire), 8 = GHA_WIDEBAND
    (strategy B; wb_refine: False = subband refine, True = raw, per
    --advanced ghawbrefine).  Default GHA_ENABLED = 7."""
    c, t = pcm.shape
    f = t // T.NUM_SAMPLES

    bands = band_frames(pcm)                        # [C, F, 16, 128]
    if gha_mask is None:
        resid = bands
        tone_out = None
    else:
        if gha_mask & 8:
            raw = pcm.reshape(c, f, T.NUM_SAMPLES)
            tone_planes = gha.extract_wideband(
                bands, raw, refine_raw=bool(wb_refine))
        else:
            tone_planes = gha.extract(bands)
        src = bands if (gha_mask & 1) else jnp.zeros_like(bands)
        resid = gha.subtract(src, tone_planes)
        if not (gha_mask & 4):
            resid = jnp.zeros_like(resid)
        if gha_mask & 2:
            # shift to output alignment (one-frame tonal-block delay,
            # at3p.cpp:128-131,173-177); sharing/leader are per-frame (ax 0)
            tone_out = {}
            for k, v in tone_planes.items():
                ax = 0 if k in ("sharing", "leader") else 1
                pad = [(0, 0)] * v.ndim
                pad[ax] = (1, 0)
                tone_out[k] = jnp.pad(v[(slice(None),) * ax
                                        + (slice(None, -1),)], pad)
        else:
            tone_out = None
    # one-frame delay: output frame f carries content frame f-1 (LOOK_AHEAD)
    res = jnp.pad(resid[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    specs = mdct_frames(res * T.RESIDUAL_SCALE)     # [C, F, 2048]

    blocks = gather_qu_blocks(specs)                # [C, F, 32, 128]
    sfi, scaled, _ = scale_ops.scale_blocks(
        blocks, _GATHER_MASK, _SCALE_TABLE)

    inv_mant = jnp.asarray(T.INV_MANT_TAB)[jnp.asarray(T.FIXED_WORDLEN)]
    mant = jnp.round(scaled * inv_mant[:, None]).astype(jnp.int32)
    mant = jnp.where(_GATHER_MASK, mant, 0)

    # best-of-8 spectrum table per QU (strict less -> first minimum)
    costs = []
    for qu in range(32):
        wl = int(T.FIXED_WORDLEN[qu])
        qc = [ _qu_table_cost(mant[..., qu, :], qu, 7 * i + wl - 1)
               for i in range(8) ]
        costs.append(jnp.stack(qc, axis=-1))        # [C, F, 8]
    cost = jnp.stack(costs, axis=-2)                # [C, F, 32, 8]
    spec_tab = jnp.argmin(cost, axis=-1).astype(jnp.int32)
    spec_bits = jnp.min(cost, axis=-1)              # [C, F, 32]

    return sfi, mant, spec_tab, spec_bits, tone_out


def encode_track(pcm: np.ndarray, use_gha=True, wb_refine=False):
    """[C, T] PCM -> ATRAC3+ frame planes (dict of numpy arrays).

    use_gha: True -> GHA_ENABLED (mask 7); False -> GHA disabled entirely
    (plain transform); int -> the reference's ghadbg mask (0..15, bit 3 =
    wideband strategy B).  wb_refine selects ghawbrefine=1 (raw)."""
    pcm = np.atleast_2d(np.asarray(pcm, np.float32))
    c, t = pcm.shape
    pad = (-t) % T.NUM_SAMPLES
    if pad:
        pcm = np.pad(pcm, ((0, 0), (0, pad)))

    if use_gha is True:
        gha_mask = 7
    elif use_gha is False:
        gha_mask = None
    else:
        gha_mask = int(use_gha)
    sfi, mant, spec_tab, spec_bits, tone_out = _encode_core(
        jnp.asarray(pcm), gha_mask=gha_mask, wb_refine=wb_refine)
    sfi, mant, spec_tab, spec_bits = (
        np.asarray(x) for x in (sfi, mant, spec_tab, spec_bits))
    tones = None
    if tone_out is not None:
        import jax
        tones = jax.device_get(tone_out)
        # wire order wants ascending frequencies per band
        order = np.argsort(
            np.where(tones["valid"], tones["freq"], 1 << 20), axis=-1)
        tones = {k: (np.take_along_axis(v, order, axis=-1)
                     if v.ndim == 4 else v)
                 for k, v in tones.items()}
        tonal_bits = _tonal_section_bits(tones, c)
    else:
        tonal_bits = np.zeros(sfi.shape[1], np.int64)

    # NumQuantUnits shrink (CheckFrameDone, at3p_bitstream.cpp:529-541):
    # candidates 32, 28, 27, ... 1; first whose total fits 2048*8-3 bits
    budget = T.FRAME_BYTES * 8 - 3
    const_bits = _const_bits(c)
    cum = np.concatenate([np.zeros_like(spec_bits[..., :1]),
                          np.cumsum(spec_bits, axis=-1)], axis=-1)  # [C,F,33]
    total = const_bits[None] + cum.sum(axis=0) + tonal_bits[:, None]
    candidates = [32] + list(range(28, 0, -1))
    num_qu = np.full(total.shape[0], 1, np.int32)
    chosen = np.zeros(total.shape[0], bool)
    for nq in candidates:
        ok = ~chosen & (total[:, nq] <= budget)
        num_qu[ok] = nq
        chosen |= ok
    out = {
        "num_qu": num_qu,
        "sfi": sfi,
        "mant": mant,
        "spec_tab": spec_tab,
    }
    if tones is not None:
        out["tones"] = tones
    return out


def dryrun_sharded(mesh, mesh1):
    """Driver hook: jit the AT3P core over a (dp, sp) mesh on tiny shapes
    and assert bit-identity with single-device execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    s = max(2, dp)
    t = T.NUM_SAMPLES * 2 * sp
    rng = np.random.default_rng(2)
    pcm = (0.25 * rng.standard_normal((s, 2, t))).astype(np.float32)

    def enc(xs):
        return jax.vmap(lambda p: _encode_core(p, gha_mask=7))(xs)

    outs = {}
    for name, m in (("sharded", mesh), ("single", mesh1)):
        in_sh = NamedSharding(m, P("dp", None, "sp"))
        out_sh = NamedSharding(m, P("dp"))
        fn = jax.jit(enc, in_shardings=in_sh, out_shardings=out_sh)
        outs[name] = jax.device_get(fn(jax.device_put(
            jnp.asarray(pcm), in_sh)))
    flat_a = jax.tree.leaves(outs["sharded"])
    flat_b = jax.tree.leaves(outs["single"])
    for a, b in zip(flat_a, flat_b):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            "AT3P sharded != unsharded"


def _num_tone_bands(tones):
    """[F] number of tone bands per output frame (0 = no tonal block)."""
    any_wave = tones["valid"].any(axis=-1).any(axis=0)   # [F, 8]
    nb = np.where(any_wave, np.arange(8)[None, :] + 1, 0).max(axis=-1)
    return nb.astype(np.int64)


def _tonal_section_bits(tones, channels):
    """Bits of the tonal block per frame (WriteTonalBlock dry run,
    at3p_bitstream.cpp:366-520); the 'tonal present' flag itself lives in
    the constant section."""
    from . import frame as fr
    nb = _num_tone_bands(tones)
    bits = np.zeros(nb.shape[0], np.int64)
    for fi in range(nb.shape[0]):
        if nb[fi]:
            bits[fi] = sum(w for _, w in fr.tonal_block_fields(
                tones, fi, channels, int(nb[fi])))
    return bits
