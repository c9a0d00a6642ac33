// Test harness: run the reference PaletteDecompressor on stdin-provided data.
// argv: inputSize outputSize colorCompression ; stdin: input bytes; stdout: output bytes
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include "../include/YAIK_private.h"
void SetErrorCode(YAIK_ERROR_CODE e) {}
void kassert(bool) {}
int main(int argc, char** argv) {
    int inputSize = atoi(argv[1]);
    int outputSize = atoi(argv[2]);
    int cc = atoi(argv[3]);
    u8* in = new u8[inputSize + 128*3];
    memset(in, 0, inputSize + 128*3);
    fread(in, 1, inputSize, stdin);
    u8* out = new u8[outputSize + 65536];
    bool ok = PaletteDecompressor(in, inputSize, inputSize + 128*3, out, outputSize, cc);
    fprintf(stderr, "ok=%d\n", ok);
    fwrite(out, 1, outputSize, stdout);
    return ok ? 0 : 1;
}
