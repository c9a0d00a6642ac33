// Golden-fixture driver for the reference's DEAD SmoothMap pass (SMAP
// chunk, EncoderContext.cpp:2564-2764, no call site in Convert; the decoder
// deprecates the tag at YAIK_API.cpp:569). Ours, not reference code.
//
// NOTE: the pass contains real undefined behavior (its 1/16-res RGB loop
// indexes the quarter-res smooth map with full-res coordinates: clamped
// reads via GetPixelValue but RAW out-of-bounds writes at :2686, and the
// final RemoveMask reads past the quarter buffer at :2728). This driver
// exists to measure whether that UB is deterministic on a given build; see
// tests/test_smooth_map.py for how parity is asserted.
//
// Usage: ref_encode_smap img.png out.yaik
#include <cstdio>
#include <cstring>
#include <cstdint>
#include "EncoderContext.h"

struct SmapDriver : EncoderContext {
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

        convRGB2YCoCg(true);   // SmoothMap reads YCoCgImg
        Image* output = Image::CreateImage(original->GetWidth(),
                                           original->GetHeight(), 3, true);
        SmoothMap(output);

        uint32_t sentinel = 0xDEADBEEF;
        fwrite(&sentinel, sizeof(sentinel), 1, outF);
        fclose(outF);
        return true;
    }
};

int main(int argc, const char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: ref_encode_smap img.png out.yaik\n"); return 1; }
    SmapDriver* ctx = new SmapDriver();
    EncoderStats stats;
    memset(&stats, 0, sizeof(stats));
    ctx->pStats = &stats;
    ctx->halfCoW = true;  ctx->halfCoH = false;
    ctx->downSampleCo = EDownSample::AVERAGE_BOX;
    ctx->halfCgW = true;  ctx->halfCgH = false;
    ctx->downSampleCg = EDownSample::AVERAGE_BOX;
    ctx->isSwizzling = true;
    ctx->favorAccuracy = false;
    int ret = ctx->Run(argv[1], argv[2]) ? 0 : 1;
    ctx->Release();
    delete ctx;
    return ret;
}
