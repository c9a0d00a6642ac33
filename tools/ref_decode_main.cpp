// Fixture driver around the reference decoder library (ours, not reference code).
// Usage: ref_decoder file.yaik LutFile.lut out.raw
// Writes the decoded interleaved RGB(A8) buffer to out.raw and prints
// "W H CH" on stdout. Exit 0 on success.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include "YAIK.h"   // resolved via -I $REF/include

static unsigned char* loadFile(const char* name, unsigned int* size) {
    FILE* f = fopen(name, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", name); return nullptr; }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    unsigned char* buf = (unsigned char*)malloc(n);
    if (fread(buf, 1, n, f) != (size_t)n) { fclose(f); free(buf); return nullptr; }
    fclose(f);
    *size = (unsigned int)n;
    return buf;
}

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: ref_decoder file.yaik LutFile.lut out.raw\n"); return 1; }
    YAIK_LIB lib = YAIK_Init(8, nullptr);
    if (!lib) { fprintf(stderr, "YAIK_Init failed\n"); return 1; }

    unsigned int lutSize = 0, yaikSize = 0;
    unsigned char* lut = loadFile(argv[2], &lutSize);
    unsigned char* yaik = loadFile(argv[1], &yaikSize);
    if (!lut || !yaik) return 1;
    YAIK_AssignLUT(lib, lut, lutSize);
    if (YAIK_GetErrorCode() != YAIK_NO_ERROR) {
        fprintf(stderr, "YAIK_AssignLUT failed\n");
        return 1;
    }

    YAIK_SDecodedImage info;
    memset(&info, 0, sizeof(info));
    if (!YAIK_DecodeImagePre(lib, yaik, yaikSize, &info)) {
        fprintf(stderr, "DecodeImagePre failed err=%d\n", (int)YAIK_GetErrorCode());
        return 1;
    }
    bool useCustom = info.hasAlpha;  // stock RGBA interleave is broken upstream
    int ch = info.hasAlpha ? 4 : 3;
    size_t imgSize = (size_t)info.width * info.height * ch;
    unsigned char* out = (unsigned char*)malloc(imgSize);
    memset(out, 0, imgSize);
    info.outputImage = out;
    info.outputImageStride = info.width * ch;
    if (useCustom) {
        // correct RGBA interleave from the planar 8x8-swizzled RGB + linear A
        info.customImageOutput = [](YAIK_SDecodedImage* ui,
                                    YAIK_SCustomDataSource* src) {
            int w = ui->width, h = ui->height;
            for (int y = 0; y < h; y++) {
                unsigned char* dst = ui->outputImage + (size_t)y * ui->outputImageStride;
                for (int x = 0; x < w; x++) {
                    int tile = (y >> 3) * (w >> 3) + (x >> 3);
                    int idx = tile * 64 + (y & 7) * 8 + (x & 7);
                    *dst++ = src->planeR[idx];
                    *dst++ = src->planeG[idx];
                    *dst++ = src->planeB[idx];
                    *dst++ = src->planeA ? src->planeA[x + y * src->strideA] : 255;
                }
            }
        };
    }

    if (!YAIK_DecodeImage(yaik, yaikSize, &info)) {
        fprintf(stderr, "DecodeImage failed err=%d\n", (int)YAIK_GetErrorCode());
        return 1;
    }

    FILE* fo = fopen(argv[3], "wb");
    fwrite(out, 1, imgSize, fo);
    fclose(fo);
    printf("%d %d %d\n", info.width, info.height, ch);
    YAIK_Release(lib);
    return 0;
}
