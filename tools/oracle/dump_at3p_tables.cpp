// Dumps the ATRAC3+ format constants (ffmpeg-derived codebooks, PQF
// prototype, scale tables, mantissa tables) from the reference build into
// flat binary files, to be converted into the new framework's data bundle.
#include <cstdio>
#include <cstdint>
#include <cstring>

#include "atrac/at3p/at3p_tables.h"

#include "atrac/atrac3plus_pqf/atrac3plus_pqf_data.h"

// mantissa quant table from ffmpeg data header (via at3p_bitstream usage)
#include "atrac/at3p/ff/atrac3plus_data.h"

using namespace NAtracDEnc::NAt3p;

static void dump(const char* name, const void* p, size_t bytes) {
    char path[256];
    snprintf(path, sizeof(path), "at3p_%s.bin", name);
    FILE* f = fopen(path, "wb");
    fwrite(p, 1, bytes, f);
    fclose(f);
    printf("%s %zu\n", name, bytes);
}

int main() {
    THuffTables huff;

    // VLC tables: store code and len as int16 planes
    {
        int16_t code[16], len[16];
        for (int i = 0; i < 16; i++) {
            code[i] = huff.NumToneBands[i].Code;
            len[i] = huff.NumToneBands[i].Len;
        }
        dump("tone_bands_code", code, sizeof(code));
        dump("tone_bands_len", len, sizeof(len));
    }
    {
        static int16_t code[112][256], len[112][256];
        for (int t = 0; t < 112; t++)
            for (int i = 0; i < 256; i++) {
                code[t][i] = huff.VlcSpecs[t][i].Code;
                len[t][i] = huff.VlcSpecs[t][i].Len;
            }
        dump("spec_code", code, sizeof(code));
        dump("spec_len", len, sizeof(len));
    }
    {
        int16_t code[4][8], len[4][8];
        for (int t = 0; t < 4; t++)
            for (int i = 0; i < 8; i++) {
                code[t][i] = huff.WordLens[t][i].Code;
                len[t][i] = huff.WordLens[t][i].Len;
            }
        dump("wl_code", code, sizeof(code));
        dump("wl_len", len, sizeof(len));
        for (int t = 0; t < 4; t++)
            for (int i = 0; i < 8; i++) {
                code[t][i] = huff.CodeTables[t][i].Code;
                len[t][i] = huff.CodeTables[t][i].Len;
            }
        dump("ct_code", code, sizeof(code));
        dump("ct_len", len, sizeof(len));
    }

    dump("scale_table", TScaleTable::ScaleTable, sizeof(float) * 64);

    {
        float inv[8];
        for (int i = 0; i < 8; i++) inv[i] = InvMantTab(i);
        dump("inv_mant", inv, sizeof(inv));
        dump("mant_tab", atrac3p_mant_tab, sizeof(atrac3p_mant_tab));
    }

    // spectrum codebook descriptors: for each of 112 tables ffmpeg has
    // (cb: value range info) — dump the static description table used to
    // map (quant unit wordlen, table idx) -> vlc table and its params
    dump("spectra_tabs", &atrac3p_spectra_tabs[0],
         sizeof(atrac3p_spectra_tabs));

    // PQF prototype: rebuild the analysis FIR exactly like
    // atrac3plus_pqf.c:init()
    {
        static float fir[384];
        for (int i = 0; i < 16; i++) {
            for (int j = 0; j < ATRAC3P_PQF_FIR_LEN; j++) {
                if (i >= 8) {
                    fir[j + 96 + (i - 8) * 12] = ff_ipqf_coeffs1[j][i];
                    fir[j + 288 + (i - 8) * 12] = ff_ipqf_coeffs2[j][i];
                } else {
                    fir[j + 192 + i * 12] = ff_ipqf_coeffs2[j][i];
                    fir[j + 0 + i * 12] = ff_ipqf_coeffs1[j][i];
                }
            }
        }
        dump("pqf_fir", fir, sizeof(fir));
        dump("ipqf_coeffs1", ff_ipqf_coeffs1, sizeof(ff_ipqf_coeffs1));
        dump("ipqf_coeffs2", ff_ipqf_coeffs2, sizeof(ff_ipqf_coeffs2));
    }
    return 0;
}
