// Golden-fixture driver for the reference's DISABLED SingleColorOut pass
// (UCOL chunk, EncoderContext.cpp:1771-2283, call site commented out at
// :9036). Ours, not reference code: a subclass replays the Convert()
// preamble (:8986-9040) and invokes the protected pass methods directly,
// producing  header + [MIPM + ALPM] + UCOL + 0xDEADBEEF  streams that
// yaik_tpu's encoder must match byte-for-byte.
//
// SingleColorOut only reads `original` + `mipmapMask` and writes `outFile`,
// so the gradient/3D/1D passes are not needed for an exact UCOL golden
// (verified: no other Convert state feeds the pass).
//
// Usage: ref_encode_ucol img.png out.yaik [--mip]
#include <cstdio>
#include <cstring>
#include <cstdint>
#include "EncoderContext.h"   // -I $REF/encoder

struct UcolDriver : EncoderContext {
    bool Run(const char* src, const char* out, bool withMip) {
        originalName = src;
        if (!LoadImagePNG(src)) { fprintf(stderr, "cannot load %s\n", src); return false; }

        FILE* outF = fopen(out, "wb");
        if (!outF) return false;
        outFile = outF;

        // FileHeader write, as Convert() does (EncoderContext.cpp:9007-9016)
        FileHeader header;
        header.width  = original->GetWidth();
        header.height = original->GetHeight();
        header.tag.tag8[0] = 'Y'; header.tag.tag8[1] = 'A';
        header.tag.tag8[2] = 'I'; header.tag.tag8[3] = 'K';
        header.version  = 1;
        header.infoMask = original->HasAlpha() ? 1 : 0;
        fwrite(&header, sizeof(FileHeader), 1, outF);

        if (withMip) {
            MipPrefilter(true);     // :9027 (commented out upstream)
            ProcessAlpha(true);     // :9028 (commented out upstream)
        }

        Image* output = Image::CreateImage(original->GetWidth(),
                                           original->GetHeight(), 3, true);
        SingleColorOut(true, output);   // :9036 (commented out upstream)

        uint32_t sentinel = 0xDEADBEEF;
        fwrite(&sentinel, sizeof(sentinel), 1, outF);
        fclose(outF);
        return true;
    }
};

int main(int argc, const char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: ref_encode_ucol img.png out.yaik [--mip]\n"); return 1; }
    bool withMip = argc > 3 && !strcmp(argv[3], "--mip");

    UcolDriver* ctx = new UcolDriver();
    EncoderStats stats;                 // EndCorrelationSearch-style unguarded
    memset(&stats, 0, sizeof(stats));   // pStats derefs exist in other passes;
    ctx->pStats = &stats;               // harmless to always provide.

    ctx->halfCoW = true;  ctx->halfCoH = false;
    ctx->downSampleCo = EDownSample::AVERAGE_BOX;
    ctx->halfCgW = true;  ctx->halfCgH = false;
    ctx->downSampleCg = EDownSample::AVERAGE_BOX;
    ctx->isSwizzling = true;
    ctx->favorAccuracy = false;

    int ret = ctx->Run(argv[1], argv[2], withMip) ? 0 : 1;
    ctx->Release();
    delete ctx;
    return ret;
}
