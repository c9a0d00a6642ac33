// Fixture driver around the reference encoder library (ours, not reference code).
// Same configuration as the reference CLI (ImageEncoder.cpp:158-213), but with
// the EncoderStats struct wired up: the reference's EndCorrelationSearch
// dereferences pStats unguarded (EncoderContext.cpp:7618), so running with the
// stock main (stats commented out) segfaults. The stock main never worked with
// stats disabled; upstream evidently always ran with stats on.
//
// Usage: ref_encode img.png out.yaik
#include <cstdio>
#include <cstring>
#include "EncoderContext.h"   // -I $REF/encoder

int main(int argc, const char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: ref_encode img.png out.yaik\n"); return 1; }

    EncoderContext* pCtx = new EncoderContext();
    EncoderContext& ctx = *pCtx;

    EncoderStats* stats = new EncoderStats();
    memset(stats, 0, sizeof(EncoderStats));
    ctx.pStats = stats;

    // Same flags as the reference CLI main (ImageEncoder.cpp:175-190).
    ctx.halfCoW = true;
    ctx.halfCoH = false;
    ctx.downSampleCo = EDownSample::AVERAGE_BOX;
    ctx.halfCgW = true;
    ctx.halfCgH = false;
    ctx.downSampleCg = EDownSample::AVERAGE_BOX;
    ctx.isSwizzling = true;
    ctx.favorAccuracy = false;
    ctx.evaluateLUT = false;
    ctx.evaluateLUT2D = false;
    ctx.dumpImage = false;

    ctx.originalName = argv[1];
    int ret = 1;
    if (ctx.LoadImagePNG(argv[1])) {
        if (ctx.Convert(argv[1], argv[2], false)) {
            ret = 0;
            printf("=== %s complete ===\n", argv[1]);
        }
        ctx.SetImageToEncode(NULL);
    } else {
        fprintf(stderr, "cannot load %s\n", argv[1]);
    }
    ctx.Release();
    delete pCtx;
    delete stats;
    return ret;
}
