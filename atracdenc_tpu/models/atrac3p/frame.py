"""ATRAC3+ frame serialization: planes <-> fixed 2048-byte frames.

Bit layout (reference: src/atrac/at3p/at3p_bitstream.cpp): 1 start bit,
2-bit channel block type, then numQU-1 (5) + mute (1), the wordlen section
(VLC-coded deltas of the fixed allocation table), scale-factor indices
(6 bits), the code-table section, per-QU VLC spectra with sign bits, the
power-compensation stubs, window-shape/gain flags, the (optional) tonal
block, noise flag and terminator; zero-padded to 2048 bytes.
"""
import numpy as np

from atracdenc_tpu.utils import bitpack
from . import tables as T


def _wl_fields(num_qu: int):
    """ch0 wordlen section fields for the fixed allocation table."""
    wl = T.FIXED_WORDLEN[:num_qu]
    deltas = np.diff(wl)
    max_d = int(np.abs(deltas).max(initial=0))
    rng = (2, 3) if max_d >= 3 else ((1, 1) if max_d == 2 else (0, 0))
    best = min(range(rng[0], rng[1] + 1),
               key=lambda i: T.WL_LEN[i][deltas & 7].sum())
    fields = [(3, 2), (0, 2), (0, 2), (best, 2), (int(wl[0]), 3)]
    for d in deltas & 7:
        fields.append((int(T.WL_CODE[best, d]), int(T.WL_LEN[best, d])))
    return fields


def _wl_fields_ch1(num_qu: int):
    """inter-channel wordlen deltas (all zero: both use the fixed table)."""
    fields = [(1, 2), (0, 2), (0, 2)]
    for _ in range(num_qu):
        fields.append((int(T.WL_CODE[0, 0]), int(T.WL_LEN[0, 0])))
    return fields


def _qu_spectra_fields(mant, qu, tab_family):
    """One QU's spectrum fields (EncodeQuSpectra)."""
    tab_idx = 7 * tab_family + int(T.FIXED_WORDLEN[qu]) - 1
    gs, nc, bits, signed = (int(x) for x in T.SPECTRA_TABS[tab_idx])
    ln = int(T.SPECS_PER_BLOCK[qu])
    fields = []
    pos = 0
    while pos < ln:
        if gs != 1:
            fields.append((1, 1))
        for _ in range(gs):
            val = 0
            signs = []
            for i in range(nc):
                t = int(mant[pos])
                pos += 1
                if not signed and t != 0:
                    signs.append(0 if t > 0 else 1)
                    t = abs(t)
                else:
                    t = t & ((1 << bits) - 1)
                val |= t << (bits * i)
            fields.append((int(T.SPEC_CODE[tab_idx, val]),
                           int(T.SPEC_LEN[tab_idx, val])))
            for s in signs:
                fields.append((s, 1))
    return fields


def pack(planes, channels: int) -> np.ndarray:
    """planes (from encoder.encode_track) -> [F, 2048] uint8 frames."""
    num_qu = planes["num_qu"]
    sfi = planes["sfi"]
    mant = planes["mant"]
    spec_tab = planes["spec_tab"]
    n = num_qu.shape[0]

    frames = np.zeros((n, T.FRAME_BYTES), np.uint8)
    for fi in range(n):
        nq = int(num_qu[fi])
        fields = [(0, 1), (channels - 1, 2), (nq - 1, 5), (0, 1)]
        fields += _wl_fields(nq)
        if channels == 2:
            fields += _wl_fields_ch1(nq)
        for ch in range(channels):
            fields.append((0, 2))
            for qu in range(nq):
                fields.append((int(sfi[ch, fi, qu]), 6))
        # code-table section (EncodeCodeTab, useFullTable=1)
        fields.append((1, 1))
        for ch in range(channels):
            fields += [(0, 1), (0, 2), (0, 1)]
            for qu in range(nq):
                fields.append((int(spec_tab[ch, fi, qu]), 3))
        # spectra + power stubs
        for ch in range(channels):
            for qu in range(nq):
                fields += _qu_spectra_fields(
                    mant[ch, fi, qu], qu, int(spec_tab[ch, fi, qu]))
            npwr = int(T.SUBBAND_TO_NUM_POWGRPS[T.QU_TO_SUBBAND[nq - 1]])
            fields += [(15, 4)] * npwr
        # window shapes (all sine), gain comp, tonal, noise, terminator
        if channels == 2:
            fields.append((0, 2))
        fields += [(0, 1)] * channels            # sine windows
        fields += [(0, 1)] * channels            # gain comp
        fields += [(0, 1), (0, 1), (3, 2)]       # no tonal, no noise, term

        values = np.array([v for v, _ in fields], np.uint32)[None]
        widths = np.array([w for _, w in fields], np.int64)[None]
        frames[fi] = bitpack.pack_frames(values, widths, T.FRAME_BYTES)[0]
    return frames


class BitReader:
    def __init__(self, data):
        self.bits = np.unpackbits(np.ascontiguousarray(data, np.uint8))
        self.pos = 0

    def read(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | int(self.bits[self.pos])
            self.pos += 1
        return v


def _read_vlc(br, codes, lens):
    lut = {(int(c), int(l)): i for i, (c, l) in enumerate(zip(codes, lens))
           if l > 0}
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read(1)
        ln += 1
        if (code, ln) in lut:
            return lut[(code, ln)]
    raise ValueError("bad VLC")


def unpack_frame(data: np.ndarray, channels: int):
    """QA parser for one frame -> plane dict."""
    br = BitReader(data)
    assert br.read(1) == 0
    assert br.read(2) == channels - 1
    nq = br.read(5) + 1
    mute = br.read(1)
    assert mute == 0

    wl = np.zeros((channels, 32), np.int32)
    mode = br.read(2)
    assert mode == 3
    br.read(2)  # weights
    br.read(2)  # num coded vals
    tab = br.read(2)
    wl[0, 0] = br.read(3)
    for i in range(1, nq):
        d = _read_vlc(br, T.WL_CODE[tab], T.WL_LEN[tab])
        d = d - 8 if d >= 4 else d
        wl[0, i] = wl[0, i - 1] + d
    if channels == 2:
        assert br.read(2) == 1
        br.read(2)
        tab = br.read(2)
        for i in range(nq):
            d = _read_vlc(br, T.WL_CODE[tab], T.WL_LEN[tab])
            d = d - 8 if d >= 4 else d
            wl[1, i] = wl[0, i] + d

    sfi = np.zeros((channels, 32), np.int32)
    for ch in range(channels):
        assert br.read(2) == 0
        for i in range(nq):
            sfi[ch, i] = br.read(6)

    spec_tab = np.zeros((channels, 32), np.int32)
    full = br.read(1)
    for ch in range(channels):
        br.read(1)
        assert br.read(2) == 0
        br.read(1)
        for i in range(nq):
            spec_tab[ch, i] = br.read(full + 2)

    mant = np.zeros((channels, 32, 128), np.int32)
    for ch in range(channels):
        for qu in range(nq):
            tab_idx = 7 * spec_tab[ch, qu] + wl[ch, qu] - 1
            gs, nc, bits, signed = (int(x) for x in T.SPECTRA_TABS[tab_idx])
            ln = int(T.SPECS_PER_BLOCK[qu])
            pos = 0
            while pos < ln:
                if gs != 1:
                    assert br.read(1) == 1
                for _ in range(gs):
                    val = _read_vlc(br, T.SPEC_CODE[tab_idx],
                                    T.SPEC_LEN[tab_idx])
                    vals = [(val >> (bits * i)) & ((1 << bits) - 1)
                            for i in range(nc)]
                    if signed:
                        half = 1 << (bits - 1)
                        vals = [v - (1 << bits) if v >= half else v
                                for v in vals]
                        for v in vals:
                            mant[ch, qu, pos] = v
                            pos += 1
                    else:
                        for v in vals:
                            if v != 0 and br.read(1):
                                v = -v
                            mant[ch, qu, pos] = v
                            pos += 1
        npwr = int(T.SUBBAND_TO_NUM_POWGRPS[T.QU_TO_SUBBAND[nq - 1]])
        for _ in range(npwr):
            assert br.read(4) == 15
    return {"num_qu": nq, "wordlen": wl, "sfi": sfi, "mant": mant,
            "spec_tab": spec_tab, "bits_used": br.pos}
