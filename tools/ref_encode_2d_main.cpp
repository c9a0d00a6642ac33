// Golden-fixture driver for the reference's DISABLED Correlation2DSearch
// path (2DTL chunks, EncoderContext.cpp:6781-7310, call site inside the
// `#if 0` block at :9300-9382). Ours, not reference code: a subclass replays
// Convert()'s active sequence (gradient x7 -> 3D x6 -> 1D) and inserts the
// 2D block exactly where Convert has it, driving the protected pass methods
// directly. The 2D LUT bank is our synthetic Bank2D (tools/gen_bank2d.py);
// the reference's hardcoded Bank2D file list (:8037-8069, Windows
// backslash paths) ships no data files.
//
// Produces: out.yaik with GTIL + 3DTL + 2DTL(RG,GB,RB) + 1DTL chunks, plus
// LutFile.lut (3D, from RegisterAndCreate3DLut) and LutFile2D.lut (2D,
// written here with the same layout as RegisterAndCreate2DLut :8070-8095:
// LUTHeader('LU20', version 0, entryCount = patterns-1) followed by, for
// each bit depth 3..6, each pattern's x[len] + y[len] u8 tables via the
// real BinarySave2D method).
//
// Usage: ref_encode_2d img.png out.yaik  (run in a dir with Bank3D/ + Bank2D/)
#include <cstdio>
#include <cstring>
#include <cstdint>
#include <cstdlib>
#include <dirent.h>   // for the vendored header guard
#include "EncoderContext.h"   // -I $REF/encoder

static const char* BANK2D[] = {
    "Bank2D/t10_tileMap1010.lut.png",
    "Bank2D/t11_tileMap1011.lut.png",
    "Bank2D/t12_tileMap1012.lut.png",
    "Bank2D/t1_tileMap1001.lut.png",
    "Bank2D/t2_tileMap1002.lut.png",
    "Bank2D/t3_tileMap1003.lut.png",
    "Bank2D/t4_tileMap1004.lut.png",
    "Bank2D/t5_tileMap1005.lut.png",
    "Bank2D/t6_tileMap1006.lut.png",
    "Bank2D/t7_tileMap1007.lut.png",
    "Bank2D/t8_tileMap1008.lut.png",
    "Bank2D/t9_tileMap1009.lut.png",
};

struct Corr2DDriver : EncoderContext {
    void LoadBank2D() {
        correlationPatternCount2D = 0;
        for (unsigned i = 0; i < sizeof(BANK2D) / sizeof(BANK2D[0]); i++) {
            Load2DPattern(BANK2D[i]);
        }
        // LutFile2D writer, as RegisterAndCreate2DLut does (:8070-8095).
        LUTHeader hd;
        hd.lutH[0] = 'L'; hd.lutH[1] = 'U'; hd.lutH[2] = '2'; hd.lutH[3] = '0';
        hd.version = 0;
        hd.entryCount = correlationPatternCount2D - 1;
        hd.padding_extension[0] = 1;   // the reference sets [0] twice (typo);
        hd.padding_extension[1] = 0;   // [1] is stack garbage there, 0 here.
        uint32_t perPattern = ((64 + 32 + 16 + 8) * 2);
        uint32_t uncmpSize = perPattern * correlationPatternCount2D;
        u8* stream = new u8[uncmpSize];
        u8* fill = stream;
        for (int n = 0; n < 4; n++) {
            for (int m = 0; m < correlationPatternCount2D; m++) {
                fill = correlationPattern2D[m].BinarySave2D(
                    fill, 0, (EncoderContext::Mode)n);
            }
        }
        FILE* f = fopen("LutFile2D.lut", "wb");
        fwrite(&hd, sizeof(LUTHeader), 1, f);
        fwrite(stream, uncmpSize, 1, f);
        fclose(f);
        delete[] stream;
    }

    bool Run(const char* src, const char* out) {
        originalName = src;
        if (!LoadImagePNG(src)) { fprintf(stderr, "cannot load %s\n", src); return false; }
        FILE* outF = fopen(out, "wb");
        if (!outF) return false;
        outFile = outF;

        FileHeader header;
        header.width  = original->GetWidth();
        header.height = original->GetHeight();
        header.tag.tag8[0] = 'Y'; header.tag.tag8[1] = 'A';
        header.tag.tag8[2] = 'I'; header.tag.tag8[3] = 'K';
        header.version  = 1;
        header.infoMask = original->HasAlpha() ? 1 : 0;
        fwrite(&header, sizeof(FileHeader), 1, outF);

        convRGB2YCoCg(true);
        Image* output = Image::CreateImage(original->GetWidth(),
                                           original->GetHeight(), 3, true);
        int rejectFactor = 3;
        PrepareQuadSmooth();

        // gradient passes, Convert :9057-9093
        static const int GS[7][2] = {{4,4},{4,3},{3,4},{3,3},{3,2},{2,3},{2,2}};
        for (int i = 0; i < 7; i++) {
            FittingQuadSmooth(rejectFactor, original->GetPlane(0),
                original->GetPlane(1), original->GetPlane(2),
                output, false, GS[i][0], GS[i][1]);
        }
        AnalyzeColorCount(original, 8);

        // 3D passes, Convert :9117-9218
        RegisterAndCreate3DLut();
        testedLUT = correlationPatternCount3D;   // Convert :9118
        StartCorrelationSearch(true);
        static const int TS[6][2] = {{4,3},{3,4},{3,3},{3,2},{2,3},{2,2}};
        for (int i = 0; i < 6; i++) {
            Correlation3DSearch(original, output, TS[i][0], TS[i][1]);
        }
        EndCorrelationSearch(true, 7);

        // 2D passes, the disabled block at :9300-9382
        correlationPatternCount2D = 0;
        testedLUT = correlationPatternCount2D;   // = 0, as the block has it
        LoadBank2D();
        static const struct { PlaneMode m; u8 comp; } MODES[3] = {
            { Mode_RG, 3 }, { Mode_GB, 6 }, { Mode_RB, 5 },
        };
        for (int i = 0; i < 3; i++) {
            StartCorrelationSearch(false);
            Correlation2DSearch(MODES[i].m, original, output, 3, 3);
            Correlation2DSearch(MODES[i].m, original, output, 2, 2);
            EndCorrelationSearch(false, MODES[i].comp);
        }

        // 1D pass, Convert :9444-9465
        u8* tmpStream = new u8[original->GetWidth() * original->GetHeight() * 3];
        u8* wrtStream = tmpStream;
        for (int p = 0; p < 3; p++) {
            wrtStream = DynamicTileCompressor(wrtStream, original->GetPlane(p),
                mapSmoothTile->GetPlane(p), output->GetPlane(p));
        }
        GenerateDynamicTileChunk(tmpStream, (int)(wrtStream - tmpStream));
        delete[] tmpStream;

        uint32_t sentinel = 0xDEADBEEF;
        fwrite(&sentinel, sizeof(sentinel), 1, outF);
        fclose(outF);
        return true;
    }
};

int main(int argc, const char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: ref_encode_2d img.png out.yaik\n"); return 1; }
    Corr2DDriver* ctx = new Corr2DDriver();
    EncoderStats* stats = new EncoderStats();
    memset(stats, 0, sizeof(EncoderStats));
    ctx->pStats = stats;

    ctx->halfCoW = true;  ctx->halfCoH = false;
    ctx->downSampleCo = EDownSample::AVERAGE_BOX;
    ctx->halfCgW = true;  ctx->halfCgH = false;
    ctx->downSampleCg = EDownSample::AVERAGE_BOX;
    ctx->isSwizzling = true;
    ctx->favorAccuracy = false;
    ctx->evaluateLUT = false;
    ctx->evaluateLUT2D = false;
    ctx->dumpImage = false;

    int ret = ctx->Run(argv[1], argv[2]) ? 0 : 1;
    ctx->Release();
    delete ctx;
    delete stats;
    return ret;
}
