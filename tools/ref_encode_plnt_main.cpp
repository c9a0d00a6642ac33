// Golden-fixture driver for the reference's DISABLED DynamicTileEncode path
// (PLNT chunks, EncoderContext.cpp:4365-4602 + GetTileDynamic_Y :747-1212,
// call block inside `#if 0` at :9539-9545; the decoder deprecates the tag
// and ships no PLNT decode at all). Ours, not reference code.
//
// The pass additionally needs DynamicTileEncoderTable() (:701), whose only
// call site is commented out in LoadImagePNG (:1229) - the tables would be
// all zeros if the block were simply re-enabled. We call it explicitly.
// NOTE the table builder loops 256x256 over a DynamicTile[255][255] array:
// writes for maxV==255 alias the next row's first slot and row minV==255
// lands past the array (stomping the research-path globals that follow);
// reads are symmetric, so the PLNT streams remain deterministic per build.
//
// Usage: ref_encode_plnt img.png out.yaik
#include <cstdio>
#include <cstring>
#include <cstdint>
#include "EncoderContext.h"

void DynamicTileEncoderTable();   // free function in EncoderContext.cpp

struct PlntDriver : EncoderContext {
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

        DynamicTileEncoderTable();
        convRGB2YCoCg(true);
        chromaReduction();            // workCo / workCg (:2771-2783)

        Image* output = Image::CreateImage(original->GetWidth(),
                                           original->GetHeight(), 3, true);
        Plane* outY  = output->GetPlane(0);
        Plane* outCo = output->GetPlane(1);
        Plane* outCg = output->GetPlane(2);

        // the #if 0 block at :9539-9545, verbatim call sequence
        DynamicTileEncode(false, YCoCgImg->GetPlane(0), outY,
                          false, false, false, false);
        DynamicTileEncode(false, workCo, outCo, true, false, halfCoW, halfCoH);
        DynamicTileEncode(true,  workCg, outCg, false, true, halfCgW, halfCgH);

        uint32_t sentinel = 0xDEADBEEF;
        fwrite(&sentinel, sizeof(sentinel), 1, outF);
        fclose(outF);
        return true;
    }
};

int main(int argc, const char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: ref_encode_plnt img.png out.yaik\n"); return 1; }
    PlntDriver* ctx = new PlntDriver();
    EncoderStats* stats = new EncoderStats();
    memset(stats, 0, sizeof(EncoderStats));
    ctx->pStats = stats;
    ctx->halfCoW = true;  ctx->halfCoH = false;
    ctx->downSampleCo = EDownSample::AVERAGE_BOX;
    ctx->halfCgW = true;  ctx->halfCgH = false;
    ctx->downSampleCg = EDownSample::AVERAGE_BOX;
    ctx->isSwizzling = true;
    ctx->favorAccuracy = false;
    int ret = ctx->Run(argv[1], argv[2]) ? 0 : 1;
    ctx->Release();
    delete ctx;
    delete stats;
    return ret;
}
