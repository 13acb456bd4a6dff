// ATRAC3+ oracle without libgha: PQF -> (one-frame delay, no tones) ->
// MDCT -> scale -> TAt3PBitStream, mirroring TAt3PEnc::TImpl::EncodeFrame
// with UseGha = GHA_PASS_INPUT | GHA_WRITE_RESIUDAL (no tonal).
#include <cstdio>
#include <cstring>
#include <vector>
#include <memory>

#include "compressed_io.h"
#include "raw.h"
#include "atrac/atrac3plus_pqf/atrac3plus_pqf.h"
#include "atrac/at3p/at3p_bitstream.h"
#include "atrac/at3p/at3p_mdct.h"
#include "atrac/at3p/at3p_tables.h"
#include "atrac/atrac_scale.h"

using namespace NAtracDEnc;

int main(int argc, char** argv) {
    const char* inPath = argv[1];
    int nch = atoi(argv[2]);
    const char* outPath = argv[3];

    FILE* fin = fopen(inPath, "rb");
    fseek(fin, 0, SEEK_END);
    long bytes = ftell(fin);
    fseek(fin, 0, SEEK_SET);
    size_t total = bytes / (sizeof(float) * nch);
    std::vector<float> pcm(total * nch);
    fread(pcm.data(), sizeof(float), pcm.size(), fin);
    fclose(fin);

    size_t numFrames = total / 2048;
    TCompressedOutputPtr out = CreateRawOutput(outPath, nch);
    TAt3PBitStream bs(out.get(), 2048);
    TAt3pMDCT mdct;
    TScaler<NAt3p::TScaleTable> scaler;

    struct Ch {
        at3plus_pqf_a_ctx_t pqf = at3plus_pqf_create_a_ctx();
        float buf1[2048] = {0};
        float buf2[2048] = {0};
        float prev[2048] = {0};
        float* next = nullptr;
        float* cur = nullptr;
        TAt3pMDCT::THistBuf hist = {{{0}}};
        std::vector<float> specs = std::vector<float>(2048);
    };
    std::vector<Ch> chs(nch);
    for (auto& c : chs) { c.next = c.buf1; }

    // frame loop incl. one LOOK_AHEAD priming call and one drain call
    for (size_t call = 0; call <= numFrames; call++) {
        size_t src = call < numFrames ? call : 0; // drain reuses stale data
        for (int ch = 0; ch < nch; ch++) {
            float tmp[2048];
            for (size_t i = 0; i < 2048; i++)
                tmp[i] = pcm[(src * 2048 + i) * nch + ch];
            at3plus_pqf_do_analyse(chs[ch].pqf, tmp, chs[ch].next);
            if (!chs[ch].cur) {
                chs[ch].cur = chs[ch].buf2;
                std::swap(chs[ch].next, chs[ch].cur);
            }
        }
        if (call == 0) continue;

        std::vector<TAt3PBitStream::TSingleChannelElement> sces(nch);
        for (int ch = 0; ch < nch; ch++) {
            auto& c = chs[ch];
            TAt3pMDCT::TPcmBandsData p;
            static float scaled[2048];
            for (size_t i = 0; i < 2048; i++)
                scaled[i] = c.prev[i] / (32768.0 / 1.122018);
            for (size_t b = 0; b < 16; b++) p[b] = scaled + b * 128;
            mdct.Do(c.specs.data(), p, c.hist, sces[ch].SubbandInfo.Win);
            sces[ch].ScaledBlocks = scaler.ScaleFrame(
                c.specs, NAt3p::TScaleTable::TBlockSizeMod());
        }
        bs.WriteFrame(nch, nullptr, sces);

        for (int ch = 0; ch < nch; ch++) {
            memcpy(chs[ch].prev, chs[ch].cur, sizeof(float) * 2048);
            std::swap(chs[ch].next, chs[ch].cur);
        }
    }
    return 0;
}
