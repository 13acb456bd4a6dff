// Per-stage intermediate dumper for the reference ATRAC1 decoder.
// Links the reference sources as an external test oracle (same pattern as
// oracle_main.cpp).  For each frame of each channel it writes, as raw
// float32: specs[512] after dequant, the three band buffers after IMdct
// (128+128+256 floats), and the 512 synthesis outputs before clipping.
//
//   at1_debug <in.aea> <stages.f32>
#include <cstdio>
#include <cstring>
#include <vector>
#include <memory>
#include <iostream>

#include "atrac1denc.h"
#include "aea.h"
#include "lib/bitstream/bitstream.h"
#include "atrac/at1/atrac1_dequantiser.h"

using namespace NAtracDEnc;
using namespace NAtrac1;

// Minimal re-statement of TAtrac1Decoder::GetLambda()'s loop with taps.
class TDbgDecoder : public TAtrac1MDCT {
public:
    float PcmBufLow[2][256 + 16];
    float PcmBufMid[2][256 + 16];
    float PcmBufHi[2][512 + 16];
    Atrac1SynthesisFilterBank SynthesisFilterBank[2];
    TDbgDecoder() {
        memset(PcmBufLow, 0, sizeof(PcmBufLow));
        memset(PcmBufMid, 0, sizeof(PcmBufMid));
        memset(PcmBufHi, 0, sizeof(PcmBufHi));
    }
};

int main(int argc, char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s in.aea out.f32\n", argv[0]); return 1; }
    TCompressedInputPtr aea = CreateAeaInput(argv[1]);
    const uint32_t nch = aea->GetChannelNum();
    const uint64_t total = aea->GetLengthInSamples();
    FILE* fp = fopen(argv[2], "wb");
    TDbgDecoder dec;

    uint64_t done = 0;
    while (done < total) {
        for (uint32_t channel = 0; channel < nch; channel++) {
            std::unique_ptr<ICompressedIO::TFrame> frame(aea->ReadFrame());
            NBitStream::TBitStream bitstream(frame->Get(), frame->Size());
            std::vector<float> specs(512, 0.0f);
            TAtrac1Data::TBlockSizeMod mode;
            try {
                mode = TAtrac1Data::TBlockSizeMod(&bitstream);
                TAtrac1Dequantiser dequantiser;
                dequantiser.Dequant(&bitstream, mode, &specs[0]);
            } catch (const std::exception& e) {
                specs.assign(512, 0.0f);
                mode = TAtrac1Data::TBlockSizeMod();
            }
            fwrite(specs.data(), sizeof(float), 512, fp);
            dec.IMdct(&specs[0], mode, &dec.PcmBufLow[channel][0],
                      &dec.PcmBufMid[channel][0], &dec.PcmBufHi[channel][0]);
            fwrite(&dec.PcmBufLow[channel][0], sizeof(float), 128, fp);
            fwrite(&dec.PcmBufMid[channel][0], sizeof(float), 128, fp);
            fwrite(&dec.PcmBufHi[channel][0], sizeof(float), 256, fp);
            float sum[512];
            dec.SynthesisFilterBank[channel].Synthesis(
                &sum[0], &dec.PcmBufLow[channel][0],
                &dec.PcmBufMid[channel][0], &dec.PcmBufHi[channel][0]);
            fwrite(sum, sizeof(float), 512, fp);
        }
        done += 512;
    }
    fclose(fp);
    return 0;
}
