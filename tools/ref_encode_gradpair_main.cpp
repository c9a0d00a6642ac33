// Golden-fixture driver for the reference's DISABLED plane-subset gradient
// passes (GTIL chunks with plane != 7): the 2-plane 4x4 calls inside
// `if (0)` at EncoderContext.cpp:9260-9290 (RB, RG, GB order) and the
// 1-plane 4x4 calls inside `#if 0` at :9392-9420 (R, G, B). Ours, not
// reference code. Unlike the other disabled paths, the DECODER side of
// these chunks is fully live (YAIK_Gradient.cpp:1420-2732 plane variants),
// so ref_decoder provides a pixel oracle for the whole chain.
//
// Usage: ref_encode_gradpair img.png out.yaik   (cwd needs Bank3D/)
#include <cstdio>
#include <cstring>
#include <cstdint>
#include <dirent.h>
#include "EncoderContext.h"

struct GradPairDriver : EncoderContext {
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

        Plane* R = original->GetPlane(0);
        Plane* G = original->GetPlane(1);
        Plane* B = original->GetPlane(2);

        static const int GS[7][2] = {{4,4},{4,3},{3,4},{3,3},{3,2},{2,3},{2,2}};
        for (int i = 0; i < 7; i++) {
            FittingQuadSmooth(rejectFactor, R, G, B, output, false,
                              GS[i][0], GS[i][1]);
        }
        AnalyzeColorCount(original, 8);

        RegisterAndCreate3DLut();
        testedLUT = correlationPatternCount3D;
        StartCorrelationSearch(true);
        static const int TS[6][2] = {{4,3},{3,4},{3,3},{3,2},{2,3},{2,2}};
        for (int i = 0; i < 6; i++) {
            Correlation3DSearch(original, output, TS[i][0], TS[i][1]);
        }
        EndCorrelationSearch(true, 7);

        // the `if (0)` 2-plane block (:9260-9290): RB, RG, GB at 4x4
        FittingQuadSmooth(rejectFactor, R, NULL, B, output, false, 2, 2);
        FittingQuadSmooth(rejectFactor, R, G, NULL, output, false, 2, 2);
        FittingQuadSmooth(rejectFactor, NULL, G, B, output, false, 2, 2);

        // the `#if 0` 1-plane block (:9392-9420): R, G, B at 4x4
        FittingQuadSmooth(rejectFactor, R, NULL, NULL, output, false, 2, 2);
        FittingQuadSmooth(rejectFactor, NULL, G, NULL, output, false, 2, 2);
        FittingQuadSmooth(rejectFactor, NULL, NULL, B, output, false, 2, 2);

        // 1D residual on the remaining pixels (Convert :9444-9465)
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
    if (argc < 3) { fprintf(stderr, "usage: ref_encode_gradpair img.png out.yaik\n"); return 1; }
    GradPairDriver* ctx = new GradPairDriver();
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
