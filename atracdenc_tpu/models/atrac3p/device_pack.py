"""ATRAC3+ frame serialization ON DEVICE.

jnp counterpart of frame.pack (byte-identical; tests/test_at3p_device_pack.py)
producing the fixed 2048-byte frames with ops/bitdeposit.deposit_fields.
Bit layout per the reference writer (src/atrac/at3p/at3p_bitstream.cpp).

Key reformulations (same playbook as the ATRAC3 device packer):
  * the wordlen/code-table/power-stub sections depend only on numQU ->
    precomputed per-numQU field tables selected by one-hot;
  * per-QU spectra: one merged field per VLC code group — group flag, code
    and sign bits packed into a single <=18-bit field — iterated over the
    static (wordlen, blocklen, family) variants (10 QU classes x 8 spectrum
    table families), with codebook lookups as int8 one-hot matmuls (exact);
  * the tonal block (envelopes, stereo sharing, leader ordering, asc/desc
    frequency bit-packing) has a fixed entity grid whose widths are masked
    and whose offsets are closed-form prefix sums — both the asc and desc
    freq layouts are materialized and the cheaper one keeps nonzero widths
    (CreateFreqBitPack, at3p_bitstream.cpp:41-94).
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from atracdenc_tpu.ops.bitdeposit import deposit_fields
from . import frame as host_frame
from . import tables as T

MAX_W = 8                   # wave slots carried by the encoder planes


# --- static per-numQU section tables ---------------------------------------

@lru_cache(maxsize=None)
def _nq_tables(channels):
    """Per-numQU [33, S] (values, widths) for everything before the
    scale-factor section (header + wordlen sections), plus the constant
    section bit-counts."""
    max_slots = 4 + 5 + 31 + 3 + 32          # header + ch0 wl + ch1 wl
    vals = np.zeros((33, max_slots), np.uint32)
    wids = np.zeros((33, max_slots), np.int32)
    for nq in range(1, 33):
        fields = [(0, 1), (channels - 1, 2), (nq - 1, 5), (0, 1)]
        fields += host_frame._wl_fields(nq)
        if channels == 2:
            fields += host_frame._wl_fields_ch1(nq)
        for k, (v, w) in enumerate(fields):
            vals[nq, k] = v
            wids[nq, k] = w
    return vals, wids


@lru_cache(maxsize=None)
def _npwr_table():
    out = np.zeros(33, np.int32)
    for nq in range(1, 33):
        out[nq] = int(T.SUBBAND_TO_NUM_POWGRPS[T.QU_TO_SUBBAND[nq - 1]])
    return out


def _onehot_rows(table_np, idx, dtype=jnp.float32):
    """table [R, S] selected per-lane by idx [...] via exact one-hot matmul
    (0/1 rows select a single table row; values < 2^24 stay exact in f32)."""
    tab = jnp.asarray(table_np, dtype)
    oh = (idx[..., None] == jnp.arange(tab.shape[0])).astype(dtype)
    flat = oh.reshape(-1, tab.shape[0])
    out = jnp.dot(flat, tab, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + (tab.shape[1],))


# --- spectra: one merged field per code group ------------------------------

# QU classes sharing (wordlen, block length)
@lru_cache(maxsize=None)
def _qu_classes():
    classes = []
    q = 0
    while q < 32:
        wl = int(T.FIXED_WORDLEN[q])
        ln = int(T.SPECS_PER_BLOCK[q])
        e = q
        while e < 32 and int(T.FIXED_WORDLEN[e]) == wl \
                and int(T.SPECS_PER_BLOCK[e]) == ln:
            e += 1
        classes.append((q, e, wl, ln))
        q = e
    return classes


def _spec_group_fields(mant, spec_tab):
    """Merged spectrum fields for all 32 QUs of one channel.

    mant [N, 32, 128] int32, spec_tab [N, 32] int32 (family 0..7).
    Returns (values [N, 32, 128], widths [N, 32, 128]) — slot g of QU q is
    that QU's g-th code group (flag+code+signs merged); unused slots have
    width 0.  Offsets are NOT assigned here.
    """
    n = mant.shape[0]
    vals = jnp.zeros((n, 32, 128), jnp.uint32)
    wids = jnp.zeros((n, 32, 128), jnp.int32)

    for q0, q1, wl, ln in _qu_classes():
        m = mant[:, q0:q1, :ln]                  # [N, Q, ln]
        fam = spec_tab[:, q0:q1]                 # [N, Q]
        cls_v = jnp.zeros(m.shape[:2] + (128,), jnp.uint32)
        cls_w = jnp.zeros(m.shape[:2] + (128,), jnp.int32)
        for f in range(8):
            tab_idx = 7 * f + wl - 1
            gs, nc, bits, signed = (int(x) for x in T.SPECTRA_TABS[tab_idx])
            ncodes = ln // nc
            grp = m.reshape(m.shape[:2] + (ncodes, nc))
            if signed:
                t = grp & ((1 << bits) - 1)
                sw = jnp.zeros(grp.shape[:-1], jnp.int32)
                signpack = jnp.zeros(grp.shape[:-1], jnp.uint32)
            else:
                t = jnp.abs(grp)
                nz = (grp != 0).astype(jnp.int32)
                # sign bits MSB-first in mantissa order: each sign shifts
                # left by the number of signed mantissas after it
                after = (jnp.cumsum(nz[..., ::-1], -1)[..., ::-1] - nz)
                sgn = (grp < 0).astype(jnp.uint32)
                signpack = jnp.sum(sgn << after, axis=-1)
                sw = jnp.sum(nz, axis=-1)
            shifts = (bits * np.arange(nc)).astype(np.int32)
            val = jnp.sum(t.astype(jnp.uint32) << shifts, axis=-1)

            # codebook lookup: one-hot (val) x [256, 2] table, exact
            cl = _onehot_rows(
                np.stack([T.SPEC_CODE[tab_idx], T.SPEC_LEN[tab_idx]],
                         axis=-1), val)
            code = cl[..., 0].astype(jnp.uint32)
            clen = cl[..., 1].astype(jnp.int32)

            # merge group flag (first code of each gs-run) + code + signs
            gi = jnp.arange(ncodes)
            flag = (gi % gs == 0) & (gs != 1)
            fw = flag.astype(jnp.int32)
            v = (jnp.uint32(1) << (clen + sw).astype(jnp.uint32)) \
                * flag.astype(jnp.uint32) \
                + (code << sw.astype(jnp.uint32)) + signpack
            w = fw + clen + sw
            pad = 128 - ncodes
            if pad:
                v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
                w = jnp.pad(w, ((0, 0), (0, 0), (0, pad)))
            sel = (fam == f)[..., None]
            cls_v = jnp.where(sel, v, cls_v)
            cls_w = jnp.where(sel, w, cls_w)
        vals = vals.at[:, q0:q1].set(cls_v)
        wids = wids.at[:, q0:q1].set(cls_w)
    return vals, wids


# --- tonal block -----------------------------------------------------------

def _sb_flags_fields(flags, nb):
    """WriteSubbandFlags as 2 + 8 masked slots; flags [N, 8] bool, nb [N].
    Returns (values [N, 10], widths [N, 10])."""
    n = flags.shape[0]
    in_nb = jnp.arange(8)[None, :] < nb[:, None]
    f = flags & in_nb
    s = jnp.sum(f, axis=-1)
    all_set = s == nb
    none = s == 0
    v0 = jnp.where(none, 0, 1)
    v1 = jnp.where(all_set, 0, 1)
    w1 = jnp.where(none, 0, 1)
    per = jnp.where((~none & ~all_set)[:, None] & in_nb, 1, 0)
    vals = jnp.concatenate([v0[:, None], v1[:, None],
                            f.astype(jnp.int32)], axis=1)
    wids = jnp.concatenate([jnp.ones((n, 1), jnp.int32), w1[:, None], per],
                           axis=1)
    return vals.astype(jnp.uint32), wids.astype(jnp.int32)


def tonal_fields_device(tones, channels):
    """Tonal-block fields with explicit in-block offsets.

    tones: wire-effective planes (freq/amp_sf/phase/valid [C, F, 8, W],
    env_start/env_stop [C, F, 8], sharing [F, 8], leader [F]).
    Returns (values [F, S], widths [F, S], rel_offsets [F, S],
    total_bits [F], nb [F])."""
    valid = tones["valid"]
    c, f = valid.shape[:2]
    sb8 = jnp.arange(8)
    any_sb = valid.any(-1).any(0)                       # [F, 8] any channel
    nb = jnp.max(jnp.where(any_sb, sb8 + 1, 0), axis=-1)  # [F]
    present = nb > 0

    if channels == 2:
        leader = tones["leader"].astype(jnp.int32)      # [F]
        sharing = tones["sharing"] & (sb8[None, :] < nb[:, None])
    else:
        leader = jnp.zeros((f,), jnp.int32)
        sharing = jnp.zeros((f, 8), bool)

    # wire channel order: ch0 = leader
    def wire(x, wch):
        sel = jnp.where(wch == 0, leader, 1 - leader)
        idx = sel.reshape((1, f) + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, idx, axis=0)[0]

    vals, wids, offs = [], [], []

    def emit(v, w, o):
        vals.append(v.astype(jnp.uint32).reshape(f, -1))
        wids.append(w.astype(jnp.int32).reshape(f, -1))
        offs.append(o.astype(jnp.int32).reshape(f, -1))

    g = lambda w: jnp.where(present, w, 0)
    z = jnp.zeros((f,), jnp.int32)

    # header: amplitude mode, num tone bands VLC
    emit(jnp.ones((f,)), g(jnp.ones((f,), jnp.int32)), z)
    tb = _onehot_rows(np.stack([T.TONE_BANDS_CODE, T.TONE_BANDS_LEN], -1),
                      jnp.maximum(nb - 1, 0))
    nb_code, nb_len = tb[..., 0].astype(jnp.uint32), \
        tb[..., 1].astype(jnp.int32)
    pos = g(jnp.ones((f,), jnp.int32))
    emit(nb_code, g(nb_len), pos)
    pos = pos + g(nb_len)

    if channels == 2:
        shv, shw = _sb_flags_fields(sharing, nb)
        shw = jnp.where(present[:, None], shw, 0)
        sh_off = pos[:, None] + jnp.cumsum(shw, -1) - shw
        emit(shv, shw, sh_off)
        pos = pos + shw.sum(-1)
        ldv, ldw = _sb_flags_fields(
            jnp.pad((leader == 1)[:, None], ((0, 0), (0, 7))),
            jnp.ones((f,), jnp.int32))
        ldv, ldw = ldv[:, :3], jnp.where(present[:, None], ldw[:, :3], 0)
        ld_off = pos[:, None] + jnp.cumsum(ldw, -1) - ldw
        emit(ldv, ldw, ld_off)
        pos = pos + ldw.sum(-1)
        emit(z, g(jnp.ones((f,), jnp.int32)), pos)      # no phase inversion
        pos = pos + g(jnp.ones((f,), jnp.int32))

    for wch in range(channels):
        coded = (sb8[None, :] < nb[:, None]) \
            & ~(sharing if wch == 1 else jnp.zeros_like(sharing))
        w_valid = wire(valid, wch)                      # [F, 8, W]
        nw = jnp.sum(w_valid, -1)                       # [F, 8]
        es = wire(tones["env_start"], wch)
        et = wire(tones["env_stop"], wch)
        freq = jnp.where(w_valid, wire(tones["freq"], wch), 0)
        asf = wire(tones["amp_sf"], wch)
        ph = wire(tones["phase"], wch)

        if wch:
            emit(z, g(jnp.ones((f,), jnp.int32)), pos)  # own envelope data
            pos = pos + g(jnp.ones((f,), jnp.int32))

        # envelopes: per sb 4 slots (start flag, start, stop flag, stop)
        sp = (es >= 0) & coded
        tp = (et >= 0) & coded
        ev = jnp.stack([sp.astype(jnp.uint32),
                        jnp.maximum(es, 0).astype(jnp.uint32),
                        tp.astype(jnp.uint32),
                        jnp.maximum(et, 0).astype(jnp.uint32)], -1)
        ew = jnp.stack([jnp.where(coded, 1, 0),
                        jnp.where(sp, 5, 0),
                        jnp.where(coded, 1, 0),
                        jnp.where(tp, 5, 0)], -1)       # [F, 8, 4]
        ew_flat = ew.reshape(f, 32)
        e_off = pos[:, None] + jnp.cumsum(ew_flat, -1) - ew_flat
        emit(ev.reshape(f, 32), ew_flat, e_off)
        pos = pos + ew_flat.sum(-1)

        # num-waves mode + counts
        emit(z, g(jnp.full((f,), wch + 1, jnp.int32)), pos)
        pos = pos + g(jnp.full((f,), wch + 1, jnp.int32))
        nw_w = jnp.where(coded, 4, 0)
        nw_off = pos[:, None] + jnp.cumsum(nw_w, -1) - nw_w
        emit(nw.astype(jnp.uint32), nw_w, nw_off)
        pos = pos + nw_w.sum(-1)

        if wch:
            emit(z, g(jnp.ones((f,), jnp.int32)), pos)  # freqs independent
            pos = pos + g(jnp.ones((f,), jnp.int32))

        # frequency packs: order bit + asc/desc layouts (the cheaper one
        # keeps its widths).  Waves are frequency-ascending in slot order.
        has = coded & (nw > 0)
        wi = jnp.arange(MAX_W)
        # ascending: first 10 bits; then 10 if prev < 512 else fsb(1023-prev)+1
        prev_a = jnp.pad(freq[..., :-1], ((0, 0), (0, 0), (1, 0)))
        fsb = lambda x: 31 - jax.lax.clz(jnp.maximum(x, 1).astype(jnp.int32))
        wa = jnp.where(prev_a < 512, 10, fsb(1023 - prev_a) + 1)
        wa = jnp.where(wi == 0, 10, wa)
        va = jnp.where(wi == 0, freq,
                       jnp.where(prev_a < 512, freq,
                                 freq - (1024 - (jnp.int32(1) << jnp.clip(
                                     wa, 0, 10).astype(jnp.uint32)))))
        wa = jnp.where(w_valid & has[..., None], wa, 0)
        bits_asc = wa.sum(-1)
        # descending: emitted from the highest wave down; first field is the
        # highest freq at 10 bits, then width = fsb(prev)+1 with prev = the
        # next-higher wave's freq
        last_i = jnp.maximum(nw - 1, 0)
        is_last = wi[None, None, :] == last_i[..., None]
        prev_d = jnp.pad(freq[..., 1:], ((0, 0), (0, 0), (0, 1)))
        wd = jnp.where(is_last, 10, fsb(prev_d) + 1)
        wd = jnp.where(w_valid & has[..., None], wd, 0)
        vd = jnp.where(is_last, freq, freq & ((jnp.int32(1) << jnp.clip(
            wd, 0, 10).astype(jnp.uint32)) - 1))
        bits_desc = wd.sum(-1)
        multi = nw > 1
        # CreateFreqBitPack returns asc only when strictly cheaper (desc
        # wins ties, at3p_bitstream.cpp:88-93); single-wave has no order bit
        use_desc = multi & (bits_asc >= bits_desc) & has
        ob_w = jnp.where(has & multi, 1, 0)
        pack_bits = jnp.where(use_desc, bits_desc,
                              jnp.where(has, bits_asc, 0))
        sb_bits = ob_w + pack_bits                      # [F, 8]
        sb_off = pos[:, None] + jnp.cumsum(sb_bits, -1) - sb_bits
        emit(use_desc.astype(jnp.uint32), ob_w, sb_off)
        base = sb_off + ob_w
        # asc offsets: cumsum of wa in slot order; desc offsets: fields run
        # highest wave first, so slot i sits after the widths of slots > i
        off_a = base[..., None] + jnp.cumsum(wa, -1) - wa
        after_d = jnp.cumsum(wd[..., ::-1], -1)[..., ::-1] - wd
        off_d = base[..., None] + after_d
        emit(jnp.where(use_desc[..., None], vd, va) * w_valid,
             jnp.where(use_desc[..., None], wd, wa),
             jnp.where(use_desc[..., None], off_d, off_a))
        pos = pos + sb_bits.sum(-1)

        # amplitude mode + amp sf + phases
        emit(z, g(jnp.full((f,), wch + 1, jnp.int32)), pos)
        pos = pos + g(jnp.full((f,), wch + 1, jnp.int32))
        aw = jnp.where(w_valid & has[..., None], 6, 0)
        aw_flat = aw.reshape(f, -1)
        a_off = pos[:, None] + jnp.cumsum(aw_flat, -1) - aw_flat
        emit((asf * w_valid).reshape(f, -1), aw_flat, a_off)
        pos = pos + aw_flat.sum(-1)
        pw = jnp.where(w_valid & has[..., None], 5, 0)
        pw_flat = pw.reshape(f, -1)
        p_off = pos[:, None] + jnp.cumsum(pw_flat, -1) - pw_flat
        emit((ph * w_valid).reshape(f, -1), pw_flat, p_off)
        pos = pos + pw_flat.sum(-1)

    values = jnp.concatenate(vals, 1)
    widths = jnp.concatenate(wids, 1)
    offsets = jnp.concatenate(offs, 1)
    return values, widths, offsets, pos, nb


# --- frame assembly --------------------------------------------------------

@partial(jax.jit, static_argnames=("channels",))
def pack_device(planes, channels):
    """Device counterpart of frame.pack: planes -> [F, 2048] uint8."""
    num_qu = planes["num_qu"].astype(jnp.int32)          # [F]
    sfi = planes["sfi"].astype(jnp.int32)                # [C, F, 32]
    mant = planes["mant"].astype(jnp.int32)              # [C, F, 32, 128]
    spec_tab = planes["spec_tab"].astype(jnp.int32)      # [C, F, 32]
    tones = planes.get("tones")
    f = num_qu.shape[0]
    in_nq = jnp.arange(32)[None, :] < num_qu[:, None]    # [F, 32]

    vals, wids, offs = [], [], []

    def emit(v, w, o):
        vals.append(v.astype(jnp.uint32).reshape(f, -1))
        wids.append(w.astype(jnp.int32).reshape(f, -1))
        offs.append(o.astype(jnp.int32).reshape(f, -1))

    # header + wordlen sections (function of numQU only)
    hv, hw = _nq_tables(channels)
    head_v = _onehot_rows(hv, num_qu).astype(jnp.uint32)
    head_w = _onehot_rows(hw, num_qu).astype(jnp.int32)
    head_off = jnp.cumsum(head_w, -1) - head_w
    emit(head_v, head_w, head_off)
    pos = head_off[:, -1] + head_w[:, -1]

    # scale factors: per ch (0,2) + nq x 6
    for ch in range(channels):
        emit(jnp.zeros((f,)), jnp.full((f,), 2), pos)
        pos = pos + 2
        w6 = jnp.where(in_nq, 6, 0)
        o6 = pos[:, None] + jnp.cumsum(w6, -1) - w6
        emit(jnp.where(in_nq, sfi[ch], 0), w6, o6)
        pos = pos + w6.sum(-1)

    # code-table section (useFullTable=1)
    emit(jnp.ones((f,)), jnp.ones((f,), jnp.int32), pos)
    pos = pos + 1
    for ch in range(channels):
        emit(jnp.zeros((f, 3)),
             jnp.broadcast_to(jnp.asarray([1, 2, 1]), (f, 3)),
             pos[:, None] + jnp.asarray([0, 1, 3]))
        pos = pos + 4
        w3 = jnp.where(in_nq, 3, 0)
        o3 = pos[:, None] + jnp.cumsum(w3, -1) - w3
        emit(jnp.where(in_nq, spec_tab[ch], 0), w3, o3)
        pos = pos + w3.sum(-1)

    # spectra + power stubs per channel
    npwr = jnp.asarray(_npwr_table())[num_qu]            # [F]
    for ch in range(channels):
        sv, sw = _spec_group_fields(mant[ch], spec_tab[ch])
        sw = jnp.where(in_nq[:, :, None], sw, 0)
        sw_flat = sw.reshape(f, -1)
        s_off = pos[:, None] + jnp.cumsum(sw_flat, -1) - sw_flat
        emit(sv.reshape(f, -1), sw_flat, s_off)
        pos = pos + sw_flat.sum(-1)
        pw = jnp.where(jnp.arange(5)[None, :] < npwr[:, None], 4, 0)
        p_off = pos[:, None] + jnp.cumsum(pw, -1) - pw
        emit(jnp.full((f, 5), 15), pw, p_off)
        pos = pos + pw.sum(-1)

    # window shapes (sine), gain comp, tonal, noise, terminator
    if channels == 2:
        emit(jnp.zeros((f,)), jnp.full((f,), 2), pos)
        pos = pos + 2
    for ch in range(channels):
        emit(jnp.zeros((f,)), jnp.ones((f,), jnp.int32), pos)
        pos = pos + 1
    for ch in range(channels):
        emit(jnp.zeros((f,)), jnp.ones((f,), jnp.int32), pos)
        pos = pos + 1
    if tones is not None:
        tv, tw, trel, tbits, nb = tonal_fields_device(tones, channels)
        present = nb > 0
        emit(present.astype(jnp.uint32), jnp.ones((f,), jnp.int32), pos)
        pos = pos + 1
        emit(tv, tw, pos[:, None] + trel)
        pos = pos + tbits
    else:
        emit(jnp.zeros((f,)), jnp.ones((f,), jnp.int32), pos)
        pos = pos + 1
    emit(jnp.zeros((f,)), jnp.ones((f,), jnp.int32), pos)   # no noise
    pos = pos + 1
    emit(jnp.full((f,), 3), jnp.full((f,), 2), pos)         # terminator
    pos = pos + 2

    values = jnp.concatenate(vals, 1)
    widths = jnp.concatenate(wids, 1)
    offsets = jnp.concatenate(offs, 1)
    return deposit_fields(values, widths, offsets, T.FRAME_BYTES)
