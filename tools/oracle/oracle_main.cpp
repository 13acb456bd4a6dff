// Offline oracle driver for the reference codec library: raw float32 PCM I/O
// (no libsndfile), used to generate golden vectors and measure the baseline.
// Modes:
//   at1enc <in.f32> <nch> <out(.aea|raw)> [bfuidxconst=0] [winmask(-1=auto)]
//   at1dec <in.aea> <out.f32>
//   at3enc <in.f32> <nch> <bitrate_bps> <nogain01> <notonal01> <cont> <out>
//         cont: oma|riff|rm|raw
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <fstream>
#include <string>
#include <vector>

#include "pcmengin.h"
#include "aea.h"
#include "raw.h"
#include "oma.h"
#include "at3.h"
#include "rm.h"
#include "atrac1denc.h"
#include "atrac/at1/atrac1_bitalloc.h"
#include "atrac3denc.h"
#include "atrac/at3/atrac3.h"

using namespace NAtracDEnc;

class TRawFloatReader : public IPCMReader {
public:
    TRawFloatReader(FILE* fp, int nch) : Fp(fp), Nch(nch) {}
    bool Read(TPCMBuffer& data, const uint32_t size) const override {
        std::vector<float> tmp((size_t)size * Nch);
        size_t got = fread(tmp.data(), sizeof(float) * Nch, size, Fp);
        if (!got) return false;
        for (size_t i = 0; i < got; i++)
            memcpy(data[i], &tmp[i * Nch], sizeof(float) * Nch);
        if (got != size) data.Zero(got, size - got);
        return true;
    }
private:
    FILE* Fp;
    int Nch;
};

class TRawFloatWriter : public IPCMWriter {
public:
    TRawFloatWriter(FILE* fp, int nch) : Fp(fp), Nch(nch) {}
    void Write(const TPCMBuffer& data, const uint32_t size) const override {
        for (uint32_t i = 0; i < size; i++)
            fwrite(data[i], sizeof(float), Nch, Fp);
    }
private:
    FILE* Fp;
    int Nch;
};

static uint64_t file_samples(const char* path, int nch) {
    FILE* f = fopen(path, "rb");
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fclose(f);
    return sz / (sizeof(float) * nch);
}

static void pump(TPCMEngine& engine, size_t step,
                 TPCMEngine::TProcessLambda lambda, uint64_t totalSamples) {
    try {
        while (totalSamples > engine.ApplyProcess(step, lambda)) {}
    } catch (TNoDataToRead&) {}
}

int main(int argc, char** argv) {
    if (argc < 2) return 2;
    std::string mode = argv[1];

    if (mode == "at1enc") {
        const char* in = argv[2];
        int nch = atoi(argv[3]);
        std::string out = argv[4];
        uint32_t bfuIdxConst = argc > 5 ? atoi(argv[5]) : 0;
        int winmask = argc > 6 ? atoi(argv[6]) : -1;
        uint64_t total = file_samples(in, nch);
        uint64_t numFrames = nch * total / 512;
        FILE* fp = fopen(in, "rb");
        TCompressedOutputPtr io;
        if (out.size() > 4 && out.substr(out.size() - 4) == ".raw")
            io = CreateRawOutput(out, nch, 212);
        else
            io = CreateAeaOutput(out, "test", nch, (uint32_t)numFrames);
        TPCMEngine engine(4096, nch,
            TPCMEngine::TReaderPtr(new TRawFloatReader(fp, nch)));
        NAtrac1::TAtrac1EncodeSettings settings(
            bfuIdxConst,
            winmask >= 0 ? NAtrac1::TAtrac1EncodeSettings::EWindowMode::EWM_NOTRANSIENT
                         : NAtrac1::TAtrac1EncodeSettings::EWindowMode::EWM_AUTO,
            winmask >= 0 ? (uint32_t)winmask : 0);
        TAtrac1Encoder enc(std::move(io), std::move(settings));
        pump(engine, 512, enc.GetLambda(), total);
        fclose(fp);
    } else if (mode == "at1dec") {
        TCompressedInputPtr io = CreateAeaInput(argv[2]);
        uint64_t total = io->GetLengthInSamples();
        int nch = io->GetChannelNum();
        FILE* fp = fopen(argv[3], "wb");
        TPCMEngine engine(4096, nch,
            TPCMEngine::TWriterPtr(new TRawFloatWriter(fp, nch)));
        TAtrac1Decoder dec(std::move(io));
        pump(engine, 512, dec.GetLambda(), total);
        fclose(fp);
    } else if (mode == "at3enc") {
        const char* in = argv[2];
        int nch = atoi(argv[3]);
        uint32_t bitrate = atoi(argv[4]);
        bool nogain = atoi(argv[5]);
        bool notonal = atoi(argv[6]);
        std::string cont = argv[7];
        std::string out = argv[8];
        uint64_t total = file_samples(in, nch);
        uint64_t numFrames = total / 1024;
        const char* yamlPath = argc > 9 ? argv[9] : nullptr;
        static std::ofstream yamlStream;
        std::ostream* yamlLog = nullptr;
        if (yamlPath) { yamlStream.open(yamlPath); yamlLog = &yamlStream; }
        NAtrac3::TAtrac3EncoderSettings settings(bitrate, nogain, notonal, nch, 0, yamlLog);
        TCompressedOutputPtr io;
        if (cont == "raw")
            io = CreateRawOutput(out, nch);
        else if (cont == "riff")
            io = CreateAt3Output(out, 2, numFrames,
                settings.ConteinerParams->FrameSz, settings.ConteinerParams->Js);
        else if (cont == "rm")
            io = CreateRmOutput(out, "test", nch, numFrames,
                settings.ConteinerParams->FrameSz, settings.ConteinerParams->Js);
        else
            io.reset(new TOma(out, "test", nch, (int32_t)numFrames,
                OMAC_ID_ATRAC3, settings.ConteinerParams->FrameSz,
                settings.ConteinerParams->Js));
        FILE* fp = fopen(in, "rb");
        TPCMEngine engine(4096, nch,
            TPCMEngine::TReaderPtr(new TRawFloatReader(fp, nch)));
        TAtrac3Encoder enc(std::move(io), std::move(settings));
        pump(engine, 1024, enc.GetLambda(), total);
        fclose(fp);
    } else {
        fprintf(stderr, "unknown mode %s\n", mode.c_str());
        return 2;
    }
    return 0;
}
