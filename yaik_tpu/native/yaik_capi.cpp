// libyaik_tpu: C-ABI host decoder (public surface in include/yaik_tpu.h).
//
// Semantics are this repo's host decoder (yaik_tpu/decoder/reference.py,
// decoder/alpha.py, format/swizzle.py, format/lut.py), which is validated
// byte-for-byte against reference-decoded fixtures. Reference parity points
// are cited per handler. The implementation is parameterized loops over
// tile shapes (the reference hand-unrolls 7+6 size-specialized functions,
// decoder/YAIK_Gradient.cpp / YAIK_3DTile.cpp; the math is identical).
//
// Security model (same as the Python host decoder): a decode either
// completes cleanly or fails with a sticky error code - corrupt streams
// must never read or write out of bounds. Guard space is over-allocated
// for per-tile streams exactly where the Python twin does.
//
// Build: tools/build_native.sh (links system libzstd for decompression -
// zstd's format is stable across versions, so decode needs no pinning).
#include "include/yaik_tpu.h"

#include <zstd.h>

#include <atomic>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <new>

// from yaik_host.cpp (same shared object)
extern "C" int palette_decompress(const uint8_t* input, int input_size,
                                  uint8_t* output, int output_size,
                                  int color_compression);

namespace {

// ---------------------------------------------------------------------------
// Errors
// ---------------------------------------------------------------------------
std::atomic<int> g_error{YAIK_NO_ERROR};

void set_error(YAIK_ERROR_CODE c) {
    int expected = YAIK_NO_ERROR;              // sticky: first failure wins
    g_error.compare_exchange_strong(expected, (int)c);
}

// ---------------------------------------------------------------------------
// Allocator plumbing
// ---------------------------------------------------------------------------
void* default_alloc(void*, size_t n) { return malloc(n); }
void default_free(void*, void* p) { free(p); }

struct Alloc {
    YAIK_SMemAlloc a;
    void* mem(size_t n) const {
        void* p = a.customAlloc(a.customContext, n);
        if (!p) set_error(YAIK_MALLOC_FAIL);
        return p;
    }
    void* zmem(size_t n) const {
        void* p = mem(n);
        if (p) memset(p, 0, n);
        return p;
    }
    // never hand NULL to a user allocator: the C ABI promises customFree
    // only sees pointers customAlloc returned (free(NULL) is safe for
    // libc but not required of injected allocators; the counting-
    // allocator test in tests/test_capi.py pins this contract)
    void rel(void* p) const { if (p) a.customFree(a.customContext, p); }
};

Alloc make_alloc(const YAIK_SMemAlloc* user) {
    Alloc al;
    if (user && user->customAlloc && user->customFree) {
        al.a = *user;
    } else {
        al.a.customAlloc = default_alloc;
        al.a.customFree = default_free;
        al.a.customContext = nullptr;
    }
    return al;
}

// ---------------------------------------------------------------------------
// Bitstream structs (format/headers.py; layouts from YAIK_private.h, all
// little-endian x86 layouts with explicit pad bytes)
// ---------------------------------------------------------------------------
#pragma pack(push, 1)
struct FileHeader {          // "4sHHHH" = 12
    char tag[4]; u16 version, width, height, infoMask;
};
struct ChunkHeader {         // "4sI" = 8
    char tag[4]; u32 length;
};
struct GradientHeader {      // "hhhhIIIIBBBB" = 28
    s16 x, y, w, h;
    u32 bitmapSize, rgbZstd, rgbCustom, rgbUncompressed;
    u8 colorCompression, version, format, plane;
};
struct Tile3DHeader {        // 12I + 12H + BB2x = 76
    u32 colorCnt, typeCnt, cnt3, cnt4, cnt5, cnt6;
    u32 cmpType, cmpColor, cmp3, cmp4, cmp5, cmp6;
    u16 map16_8, map8_16, map8_8, map4_8, map8_4, map4_4;
    u16 map16_8c, map8_16c, map8_8c, map4_8c, map8_4c, map4_4c;
    u8 component, colorRate, pad[2];
};
struct Tile3DXHeader {       // 12I + 12I + BB2x = 100 (3DTX extension)
    u32 colorCnt, typeCnt, cnt3, cnt4, cnt5, cnt6;
    u32 cmpType, cmpColor, cmp3, cmp4, cmp5, cmp6;
    u32 map16_8, map8_16, map8_8, map4_8, map8_4, map4_4;
    u32 map16_8c, map8_16c, map8_8c, map4_8c, map8_4c, map4_4c;
    u8 component, colorRate, pad[2];
};
struct Header1D {            // "IIIIBBB1x" = 20
    u32 pixZ, pixU, typZ, typU;
    u8 compressionColor, compressionRange, version, pad;
};
struct MipmapHeader {        // "hhhhIBB2x" = 16
    s16 x, y, w, h; u32 streamSize; u8 version, level, pad[2];
};
struct AlphaHeader {         // "hhhhIIBB2x" = 20
    s16 x, y, w, h; u32 streamSize, expectedSize;
    u8 version, parameters, pad[2];
};
struct UcolHeader {          // "hhhhIIIIBB2x" = 28
    s16 x, y, w, h;
    u32 mapZ, mapU, spanZ, spanU;
    u8 version, colorCount, pad[2];
};
struct SmapHeader {          // "hhhhIIIBB2x" = 24
    s16 x, y, w, h;
    u32 mapZ, rgbZ, rgbU;
    u8 version, grid, pad[2];
};
struct PlntHeader {          // "hhhhIIIBB2x" = 24
    s16 x, y, w, h;
    u32 mapZ, strZ, strU;
    u8 version, format, pad[2];
};
struct LutFileHeader {       // "4sBB2x" = 8
    char tag[4]; u8 version, entryCount, pad[2];
};
#pragma pack(pop)

constexpr u32 END_TAG = 0xDEADBEEFu;

bool tag_is(const char* t, const char* s) { return memcmp(t, s, 4) == 0; }

// ---------------------------------------------------------------------------
// zstd (exact-size contract, like DecompressData YAIK_API.cpp:505-521)
// ---------------------------------------------------------------------------
bool zdec(const u8* src, size_t csize, u8* dst, size_t usize) {
    if (csize == 0) return usize == 0;
    size_t n = ZSTD_decompress(dst, usize, src, csize);
    if (ZSTD_isError(n) || n != usize) {
        set_error(YAIK_INVALID_DECOMPRESSION);
        return false;
    }
    return true;
}

// ---------------------------------------------------------------------------
// Expanded LUTs (format/lut.py expand_lut / expand_lut2d)
// ---------------------------------------------------------------------------
struct ExpandedLut {
    u8* bits[4] = {nullptr, nullptr, nullptr, nullptr};  // index = bit-3
    int tables = 0;    // rows = tables * patterns; rowLen = comps << bit
    int patterns = 0;  // 64 (3D, 48 live + 16 fill) or 8 (2D)
    int comps = 0;     // 3 or 2
};

const int SWAPS[6][3] = {{0, 1, 2}, {0, 2, 1}, {1, 0, 2},
                         {1, 2, 0}, {2, 0, 1}, {2, 1, 0}};

bool expand_lut3d(const u8* data, u32 len, const Alloc& al, ExpandedLut* out) {
    if (len < sizeof(LutFileHeader)) { set_error(YAIK_INVALID_LUT); return false; }
    LutFileHeader h; memcpy(&h, data, sizeof h);
    int T = h.entryCount + 1;
    u32 expect = 8 + (u32)T * 3 * (8 + 16 + 32 + 64);
    if (len != expect) { set_error(YAIK_INVALID_LUT); return false; }
    out->tables = T; out->patterns = 64; out->comps = 3;
    u32 off = 8;
    for (int bi = 0; bi < 4; bi++) {
        int n = 1 << (bi + 3);
        size_t rowLen = (size_t)3 * n;
        u8* exp = (u8*)al.mem((size_t)T * 64 * rowLen);
        if (!exp) return false;
        memset(exp, 251, (size_t)T * 64 * rowLen);   // fill slots 48..63
        for (int t = 0; t < T; t++) {
            const u8* src = data + off + (size_t)t * 3 * n;  // x[n] y[n] z[n]
            for (int s = 0; s < 6; s++) {
                for (int f = 0; f < 8; f++) {
                    u8* row = exp + ((size_t)t * 64 + s * 8 + f) * rowLen;
                    for (int i = 0; i < n; i++) {
                        for (int axis = 0; axis < 3; axis++) {
                            int v = src[SWAPS[s][axis] * n + i];
                            if (f & (1 << axis)) v = 128 - v;
                            row[i * 3 + axis] = (u8)v;
                        }
                    }
                }
            }
        }
        out->bits[bi] = exp;
        off += (u32)T * 3 * n;
    }
    return true;
}

bool expand_lut2d(const u8* data, u32 len, const Alloc& al, ExpandedLut* out) {
    if (len < sizeof(LutFileHeader)) { set_error(YAIK_INVALID_LUT); return false; }
    LutFileHeader h; memcpy(&h, data, sizeof h);
    int T = h.entryCount + 1;
    u32 expect = 8 + (u32)T * 2 * (8 + 16 + 32 + 64);
    if (len != expect) { set_error(YAIK_INVALID_LUT); return false; }
    out->tables = T; out->patterns = 8; out->comps = 2;
    u32 off = 8;
    for (int bi = 0; bi < 4; bi++) {
        int n = 1 << (bi + 3);
        size_t rowLen = (size_t)2 * n;
        u8* exp = (u8*)al.mem((size_t)T * 8 * rowLen);
        if (!exp) return false;
        for (int t = 0; t < T; t++) {
            const u8* src = data + off + (size_t)t * 2 * n;  // x[n] y[n]
            for (int p = 0; p < 8; p++) {
                u8* row = exp + ((size_t)t * 8 + p) * rowLen;
                for (int i = 0; i < n; i++) {
                    int vx = src[i], vy = src[n + i];
                    if (p & 1) vx = 128 - vx;
                    if (p & 2) vy = 128 - vy;
                    // swap applied AFTER flips (expand_lut2d, format/lut.py)
                    row[i * 2 + 0] = (u8)((p & 4) ? vy : vx);
                    row[i * 2 + 1] = (u8)((p & 4) ? vx : vy);
                }
            }
        }
        out->bits[bi] = exp;
        off += (u32)T * 2 * n;
    }
    return true;
}

void free_lut(ExpandedLut* l, const Alloc& al) {
    for (int i = 0; i < 4; i++) { al.rel(l->bits[i]); l->bits[i] = nullptr; }
    l->tables = 0;
}

// ---------------------------------------------------------------------------
// Library + instance pool
// ---------------------------------------------------------------------------
constexpr u32 LIB_MAGIC = 0x79616B74;  // "yakt"

struct Instance {
    bool used = false;
    const void* stream = nullptr;
    u32 length = 0;
    u16 width = 0, height = 0;
    bool hasAlpha = false;
    struct Lib* lib = nullptr;
};

struct Lib {
    u32 magic = LIB_MAGIC;
    Alloc alloc;
    int maxInst = 0;
    Instance* inst = nullptr;
    std::mutex poolMutex;
    ExpandedLut lut3d;   // 'LUL0'
    ExpandedLut lut2d;   // 'LU20'
    bool has3d = false, has2d = false;
};

Lib* as_lib(YAIK_LIB h) {
    Lib* l = (Lib*)h;
    if (!l || l->magic != LIB_MAGIC) {
        set_error(YAIK_INVALID_LIBRARYCTX);
        return nullptr;
    }
    return l;
}

// ---------------------------------------------------------------------------
// Swizzle scan (format/swizzle.py; spec YAIK_private.h:212-276)
// ---------------------------------------------------------------------------
struct Scan {
    int bx, by, cols, rows, bits, nbx, nby, total;
};

bool scan_spec(int sx, int sy, int w, int h, Scan* s) {
    int bx, by;
    if (sx == 2 && sy == 2) { bx = 32; by = 32; }
    else if (sx == 3 && sy == 2) { bx = 64; by = 32; }
    else if (sx == 2 && sy == 3) { bx = 32; by = 64; }
    else if ((sx == 3 || sx == 4) && (sy == 3 || sy == 4)) { bx = 64; by = 64; }
    else return false;
    s->bx = bx; s->by = by;
    s->cols = bx >> sx; s->rows = by >> sy;
    s->bits = s->cols * s->rows;
    s->nbx = (w + bx - 1) / bx; s->nby = (h + by - 1) / by;
    s->total = s->nbx * s->nby * s->bits;
    return true;
}

inline size_t bitmap_bytes(const Scan& s) { return (size_t)s.total / 8; }

// bit i -> tile grid coords
inline void scan_coord(const Scan& s, int i, int* tx, int* ty) {
    int big = i / s.bits, rem = i % s.bits;
    *tx = (big % s.nbx) * s.cols + rem % s.cols;
    *ty = (big / s.nbx) * s.rows + rem / s.cols;
}

// ---------------------------------------------------------------------------
// Decode context
// ---------------------------------------------------------------------------
struct Ctx {
    Alloc al;
    int w = 0, h = 0, w8 = 0, h8 = 0;
    int strideQ = 0, nq = 0;        // corner grid (w/4+1 stride)
    int qw = 0, qh = 0;             // claim grid (4x4 quads, padded)
    u8* planes[3] = {nullptr, nullptr, nullptr};  // [h8*w8] each, de-swizzled
    u8* alpha = nullptr;            // [h*w], lazily
    bool alpha1bit = false;
    u8* mapRGB = nullptr;           // [nq*3]
    u8* hasRGB[3] = {nullptr, nullptr, nullptr};  // [nq]
    u8* claims[3] = {nullptr, nullptr, nullptr};  // [qh*qw]
    bool singleRGB = true;
    u8* mipMask = nullptr;          // [h*w] bool, after MIPM
    ~Ctx() {
        for (int p = 0; p < 3; p++) {
            al.rel(planes[p]); al.rel(hasRGB[p]); al.rel(claims[p]);
        }
        al.rel(alpha); al.rel(mapRGB); al.rel(mipMask);
    }
    bool init(int width, int height, const Alloc& alloc) {
        al = alloc;
        w = width; h = height;
        w8 = ((w + 7) / 8) * 8; h8 = ((h + 7) / 8) * 8;
        strideQ = w / 4 + 1;
        nq = strideQ * (h / 4 + 1);
        qh = ((h + 7) / 8) * 2; qw = ((w + 15) / 16) * 4;
        mapRGB = (u8*)al.zmem((size_t)nq * 3);
        if (!mapRGB) return false;
        for (int p = 0; p < 3; p++) {
            planes[p] = (u8*)al.mem((size_t)h8 * w8);
            hasRGB[p] = (u8*)al.zmem(nq);
            claims[p] = (u8*)al.zmem((size_t)qh * qw);
            if (!planes[p] || !hasRGB[p] || !claims[p]) return false;
            memset(planes[p], 0x80, (size_t)h8 * w8);
        }
        return true;
    }
    // UpdateTileAndRGBMask (YAIK_API.cpp:530-544)
    void split_masks() {
        if (!singleRGB) return;
        singleRGB = false;
        memcpy(hasRGB[1], hasRGB[0], nq);
        memcpy(hasRGB[2], hasRGB[0], nq);
        memcpy(claims[1], claims[0], (size_t)qh * qw);
        memcpy(claims[2], claims[0], (size_t)qh * qw);
    }
};

// full_range_remap (entropy/palette.py:23): v -> (v * invMul) >> 16
void full_range_remap(u8* v, size_t n, int range) {
    s64 inv = range ? ((255LL << 16) / range) : (255LL << 16);
    for (size_t i = 0; i < n; i++) v[i] = (u8)(((s64)v[i] * inv) >> 16);
}

// ---------------------------------------------------------------------------
// GTIL (reference.py:_gradient_chunk; YAIK_Gradient.cpp parity)
// ---------------------------------------------------------------------------
bool decode_gtil(Ctx& c, const u8* body, u32 blen) {
    if (blen < sizeof(GradientHeader)) { set_error(YAIK_INVALID_HEADER); return false; }
    GradientHeader h; memcpy(&h, body, sizeof h);
    const u8* payload = body + sizeof(GradientHeader);
    u32 plen = blen - sizeof(GradientHeader);
    int sx = h.format & 7, sy = (h.format >> 3) & 7;
    int tw = 1 << sx, th = 1 << sy;
    Scan sc;
    if (!scan_spec(sx, sy, c.w, c.h, &sc) ||
        (u64)h.bitmapSize + h.rgbZstd > plen) {
        set_error(YAIK_INVALID_HEADER);
        return false;
    }
    size_t bmBytes = bitmap_bytes(sc);
    if (h.bitmapSize == 0 && bmBytes != 0) { set_error(YAIK_INVALID_DECOMPRESSION); return false; }
    u8* bitmap = (u8*)c.al.mem(bmBytes ? bmBytes : 1);
    if (!bitmap) return false;
    u8* rgbCust = nullptr; u8* rgb = nullptr;
    bool ok = false;
    // guard space: corrupted bitmaps may claim more corners than the stream
    // holds; over-allocate zeros so reads stay in bounds (reference's
    // security offset, YAIK_API.cpp:896-910)
    size_t guard = (size_t)3 * ((size_t)(c.w / 4 + 1) * (c.h / 4 + 1));
    do {
        if (!zdec(payload, h.bitmapSize, bitmap, bmBytes)) break;
        rgbCust = (u8*)c.al.mem(h.rgbCustom ? h.rgbCustom : 1);
        if (!rgbCust) break;
        if (!zdec(payload + h.bitmapSize, h.rgbZstd, rgbCust, h.rgbCustom)) break;
        rgb = (u8*)c.al.zmem((size_t)h.rgbUncompressed + guard);
        if (!rgb) break;
        if (palette_decompress(rgbCust, (int)h.rgbCustom, rgb,
                               (int)h.rgbUncompressed,
                               h.colorCompression) < 0) {
            set_error(YAIK_INVALID_DECOMPRESSION);
            break;
        }
        if (h.plane != 7) c.split_masks();
        int planeList[3], nPlanes = 0;
        for (int p = 0; p < 3; p++)
            if (h.plane & (1 << p)) planeList[nPlanes++] = p;
        if (nPlanes == 0) { set_error(YAIK_INVALID_PLANE_ID); break; }

        size_t cursor = 0, cursorMax = (size_t)h.rgbUncompressed + guard;
        bool oob = false;
        for (int i = 0; i < sc.total && !oob; i++) {
            if (!((bitmap[i >> 3] >> (i & 7)) & 1)) continue;
            int tx, ty;
            scan_coord(sc, i, &tx, &ty);
            if (tx * tw >= c.w || ty * th >= c.h) continue;     // valid mask
            int x = tx * tw, y = ty * th;
            if (x + tw > c.w8 || y + th > c.h8) { oob = true; break; }
            int qx = tx * (tw / 4), qy = ty * (th / 4);
            int base = qy * c.strideQ + qx;
            int ids[4] = {base, base + tw / 4,
                          base + (th / 4) * c.strideQ,
                          base + (th / 4) * c.strideQ + tw / 4};
            for (int k = 0; k < 4; k++)
                if (ids[k] < 0 || ids[k] >= c.nq) { oob = true; }
            if (oob) break;
            // corner consumption order LT, RT, LB, RB; plane-7 decoders use
            // the plane-0 masks (YAIK_Gradient.cpp hasRGB = mapRGBMask)
            if (h.plane == 7) {
                for (int k = 0; k < 4; k++) {
                    int cid = ids[k];
                    if (!c.hasRGB[0][cid]) {
                        c.hasRGB[0][cid] = 1;
                        if (cursor + 3 > cursorMax) { oob = true; break; }
                        memcpy(c.mapRGB + (size_t)cid * 3, rgb + cursor, 3);
                        cursor += 3;
                    }
                }
            } else {
                for (int k = 0; k < 4 && !oob; k++) {
                    int cid = ids[k];
                    for (int pi = 0; pi < nPlanes; pi++) {
                        int p = planeList[pi];
                        if (!c.hasRGB[p][cid]) {
                            c.hasRGB[p][cid] = 1;
                            if (cursor >= cursorMax) { oob = true; break; }
                            c.mapRGB[(size_t)cid * 3 + p] = rgb[cursor++];
                        }
                    }
                }
            }
            if (oob) break;
            // exact integer bilinear fill (reference.py:_bilinear_tile)
            const u8* c00 = c.mapRGB + (size_t)ids[0] * 3;
            const u8* c01 = c.mapRGB + (size_t)ids[1] * 3;
            const u8* c10 = c.mapRGB + (size_t)ids[2] * 3;
            const u8* c11 = c.mapRGB + (size_t)ids[3] * 3;
            int shift = sx + sy;
            for (int pi = 0; pi < (h.plane == 7 ? 3 : nPlanes); pi++) {
                int p = (h.plane == 7) ? pi : planeList[pi];
                u8* pl = c.planes[p];
                for (int dy = 0; dy < th; dy++) {
                    int l = c00[p] * (th - dy) + c10[p] * dy;
                    int r = c01[p] * (th - dy) + c11[p] * dy;
                    u8* dst = pl + (size_t)(y + dy) * c.w8 + x;
                    for (int dx = 0; dx < tw; dx++)
                        dst[dx] = (u8)((l * (tw - dx) + r * dx) >> shift);
                }
            }
            int cp = (h.plane == 7) ? 0 : -1;
            for (int pi = 0; pi < (h.plane == 7 ? 1 : nPlanes); pi++) {
                int p = (cp == 0) ? 0 : planeList[pi];
                for (int dy = 0; dy < th / 4; dy++)
                    memset(c.claims[p] + (size_t)(qy + dy) * c.qw + qx, 1,
                           tw / 4);
            }
        }
        if (oob) { set_error(YAIK_INVALID_STREAM); break; }
        ok = true;
    } while (false);
    c.al.rel(bitmap); c.al.rel(rgbCust); c.al.rel(rgb);
    return ok;
}

// ---------------------------------------------------------------------------
// 3DTL / 3DTX (reference.py:_tile3d_chunk; YAIK_3DTile.cpp parity)
// ---------------------------------------------------------------------------
// quad-pair decode order per tile shape (reference.py:_PAIR_ORDER)
struct QuadGroup { int n; int q0x, q0y, q1x; };
struct PairOrder { int n; QuadGroup g[4]; };

bool pair_order(int sx, int sy, PairOrder* po) {
    if (sx == 4 && sy == 3) {
        *po = {4, {{2, 0, 0, 1}, {2, 0, 1, 1}, {2, 2, 0, 3}, {2, 2, 1, 3}}};
    } else if (sx == 3 && sy == 4) {
        *po = {4, {{2, 0, 0, 1}, {2, 0, 1, 1}, {2, 0, 2, 1}, {2, 0, 3, 1}}};
    } else if (sx == 3 && sy == 3) {
        *po = {2, {{2, 0, 0, 1}, {2, 0, 1, 1}, {0, 0, 0, 0}, {0, 0, 0, 0}}};
    } else if (sx == 3 && sy == 2) {
        *po = {1, {{2, 0, 0, 1}, {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}}};
    } else if (sx == 2 && sy == 3) {
        *po = {2, {{1, 0, 0, 0}, {1, 0, 1, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}}};
    } else if (sx == 2 && sy == 2) {
        *po = {1, {{1, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}}};
    } else {
        return false;
    }
    return true;
}

struct T3Streams {
    u8* colors; size_t colorCnt;     // remapped, +guard
    u8* types; size_t typeCnt;       // u16 LE pairs
    u8* idx[4]; size_t idxLen[4];    // bit 3..6, +guard
    size_t curColor = 0, curType = 0, curIdx[4] = {0, 0, 0, 0};
};

// one tile size pass (reference.py:_tile3d_size_pass)
bool tile3d_pass(Ctx& c, int sx, int sy, const u8* bitmap, size_t bmAvail,
                 T3Streams& st, const ExpandedLut& lut) {
    int tw = 1 << sx, th = 1 << sy;
    Scan sc;
    if (!scan_spec(sx, sy, c.w, c.h, &sc)) return false;
    size_t bmBytes = bitmap_bytes(sc);
    if (bmAvail < bmBytes) { set_error(YAIK_INVALID_STREAM); return false; }
    PairOrder po;
    pair_order(sx, sy, &po);
    u8* claims = c.claims[0];   // combined RGB claim map

    for (int i = 0; i < sc.total; i++) {
        if (!((bitmap[i >> 3] >> (i & 7)) & 1)) continue;
        int tx, ty;
        scan_coord(sc, i, &tx, &ty);
        if (tx * tw >= c.w || ty * th >= c.h) continue;
        int x = tx * tw, y = ty * th;
        if (x + tw > c.w8 || y + th > c.h8 ||
            (y / 4 + th / 4) > c.qh || (x / 4 + tw / 4) > c.qw) {
            set_error(YAIK_INVALID_STREAM);
            return false;
        }
        if (st.curColor + 6 > st.colorCnt || st.curType + 1 > st.typeCnt) {
            set_error(YAIK_INVALID_STREAM);
            return false;
        }
        const u8* rgb = st.colors + st.curColor; st.curColor += 6;
        u16 tileType = (u16)(st.types[st.curType * 2]
                             | (st.types[st.curType * 2 + 1] << 8));
        st.curType++;
        int combined = tileType & 0x3FFF;
        int bit = ((tileType >> 14) & 3) + 3;
        int bi = bit - 3;
        size_t rowLen = (size_t)3 << bit;
        size_t rows = (size_t)lut.tables * 64;
        // clamp like the Python twin (guard model: corrupt indices read
        // garbage, never OOB; reference over-allocates, YAIK_API.cpp:252)
        if ((size_t)combined >= rows) combined = (int)rows - 1;
        const u8* lutRow = lut.bits[bi] + (size_t)combined * rowLen;
        int mn[3] = {rgb[0], rgb[1], rgb[2]};
        int diff[3] = {rgb[3] - rgb[0], rgb[4] - rgb[1], rgb[5] - rgb[2]};
        const u8* stream = st.idx[bi];
        size_t cur = st.curIdx[bi], streamLen = st.idxLen[bi];
        int qx0 = x / 4, qy0 = y / 4;

        for (int g = 0; g < po.n; g++) {
            const QuadGroup& q = po.g[g];
            int px = x + q.q0x * 4, py = y + q.q0y * 4;
            int wpx;  // quad-columns to write starting at px (0 = skip)
            if (q.n == 2) {
                bool b0 = claims[(size_t)(qy0 + q.q0y) * c.qw + qx0 + q.q0x];
                bool b1 = claims[(size_t)(qy0 + q.q0y) * c.qw + qx0 + q.q1x];
                if (!b0 && !b1) wpx = 2;
                else if (!b0) wpx = 1;
                else if (!b1) { wpx = 1; px += 4; }
                else wpx = 0;
            } else {
                wpx = claims[(size_t)(qy0 + q.q0y) * c.qw + qx0 + q.q0x]
                          ? 0 : 1;
            }
            if (!wpx) continue;
            int npx = 16 * wpx;
            if (cur + npx > streamLen) { set_error(YAIK_INVALID_STREAM); return false; }
            for (int k = 0; k < npx; k++) {
                size_t idx = stream[cur + k];
                if (idx > rowLen - 3) idx = rowLen - 3;
                int dy = k / (wpx * 4), dx = k % (wpx * 4);
                u8* d0 = c.planes[0] + (size_t)(py + dy) * c.w8 + px + dx;
                u8* d1 = c.planes[1] + (size_t)(py + dy) * c.w8 + px + dx;
                u8* d2 = c.planes[2] + (size_t)(py + dy) * c.w8 + px + dx;
                *d0 = (u8)(mn[0] + ((diff[0] * (int)lutRow[idx]) >> 7));
                *d1 = (u8)(mn[1] + ((diff[1] * (int)lutRow[idx + 1]) >> 7));
                *d2 = (u8)(mn[2] + ((diff[2] * (int)lutRow[idx + 2]) >> 7));
            }
            cur += npx;
        }
        st.curIdx[bi] = cur;
        for (int dy = 0; dy < th / 4; dy++)
            memset(claims + (size_t)(qy0 + dy) * c.qw + qx0, 1, tw / 4);
    }
    return true;
}

u64 popcount_bytes(const u8* p, size_t n) {
    u64 c = 0;
    for (size_t i = 0; i < n; i++) c += __builtin_popcount(p[i]);
    return c;
}

bool decode_t3dl(Ctx& c, const u8* body, u32 blen, bool wide,
                 const ExpandedLut& lut) {
    Tile3DXHeader h;   // normalize both header widths into the wide layout
    if (wide) {
        if (blen < sizeof(Tile3DXHeader)) { set_error(YAIK_INVALID_HEADER); return false; }
        memcpy(&h, body, sizeof h);
        body += sizeof(Tile3DXHeader); blen -= sizeof(Tile3DXHeader);
    } else {
        if (blen < sizeof(Tile3DHeader)) { set_error(YAIK_INVALID_HEADER); return false; }
        Tile3DHeader n; memcpy(&n, body, sizeof n);
        h.colorCnt = n.colorCnt; h.typeCnt = n.typeCnt;
        h.cnt3 = n.cnt3; h.cnt4 = n.cnt4; h.cnt5 = n.cnt5; h.cnt6 = n.cnt6;
        h.cmpType = n.cmpType; h.cmpColor = n.cmpColor;
        h.cmp3 = n.cmp3; h.cmp4 = n.cmp4; h.cmp5 = n.cmp5; h.cmp6 = n.cmp6;
        h.map16_8 = n.map16_8; h.map8_16 = n.map8_16; h.map8_8 = n.map8_8;
        h.map4_8 = n.map4_8; h.map8_4 = n.map8_4; h.map4_4 = n.map4_4;
        h.map16_8c = n.map16_8c; h.map8_16c = n.map8_16c; h.map8_8c = n.map8_8c;
        h.map4_8c = n.map4_8c; h.map8_4c = n.map8_4c; h.map4_4c = n.map4_4c;
        h.component = n.component; h.colorRate = n.colorRate;
        body += sizeof(Tile3DHeader); blen -= sizeof(Tile3DHeader);
    }
    if (!lut.tables) { set_error(YAIK_INVALID_LUT); return false; }

    // 12 streams in file order (reference.py:_tile3d_chunk)
    const u32 csize[12] = {h.cmp3, h.cmp4, h.cmp5, h.cmp6, h.cmpType,
                           h.cmpColor, h.map16_8c, h.map8_16c, h.map8_8c,
                           h.map8_4c, h.map4_8c, h.map4_4c};
    const u32 usize[12] = {h.cnt3, h.cnt4, h.cnt5, h.cnt6, h.typeCnt * 2,
                           h.colorCnt, h.map16_8, h.map8_16, h.map8_8,
                           h.map8_4, h.map4_8, h.map4_4};
    u64 totalC = 0;
    for (int i = 0; i < 12; i++) totalC += csize[i];
    if (totalC > blen) { set_error(YAIK_INVALID_STREAM); return false; }

    size_t totalPx = (size_t)c.w8 * c.h8;
    u8* bufs[12] = {nullptr};
    bool ok = true;
    u32 off = 0;
    for (int i = 0; i < 12 && ok; i++) {
        // index/color streams get zero guard space (over-allocation model)
        size_t guard = (i < 4) ? totalPx : (i == 5 ? totalPx * 6 : 0);
        bufs[i] = (u8*)c.al.zmem((size_t)usize[i] + guard + 1);
        if (!bufs[i]) { ok = false; break; }
        if (csize[i]) ok = zdec(body + off, csize[i], bufs[i], usize[i]);
        else if (usize[i]) ok = false;  // declared bytes but no stream
        if (!ok) set_error(YAIK_INVALID_DECOMPRESSION);
        off += csize[i];
    }
    if (ok) {
        // PaletteFullRangeRemapping on the color stream
        full_range_remap(bufs[5], usize[5], h.colorRate);
        T3Streams st;
        st.colors = bufs[5]; st.colorCnt = (size_t)usize[5] + totalPx * 6;
        st.types = bufs[4]; st.typeCnt = h.typeCnt;
        for (int b = 0; b < 4; b++) {
            st.idx[b] = bufs[b];
            st.idxLen[b] = (size_t)usize[b] + totalPx;
        }
        // popcount cross-validation (CheckTileCount, YAIK_API.cpp:628-641)
        const int order[6][2] = {{4, 3}, {3, 4}, {3, 3}, {3, 2}, {2, 3}, {2, 2}};
        const int mapIdx[6] = {6, 7, 8, 9, 10, 11};
        u64 security = 0;
        for (int p = 0; p < 6 && ok; p++) {
            if (!usize[mapIdx[p]]) continue;
            Scan sc;
            if (!scan_spec(order[p][0], order[p][1], c.w, c.h, &sc)) {
                ok = false; set_error(YAIK_INVALID_STREAM); break;
            }
            size_t bm = bitmap_bytes(sc);
            if (usize[mapIdx[p]] < bm) { ok = false; set_error(YAIK_INVALID_STREAM); break; }
            security += popcount_bytes(bufs[mapIdx[p]], bm);
            if (security > h.typeCnt) continue;
            ok = tile3d_pass(c, order[p][0], order[p][1], bufs[mapIdx[p]],
                             usize[mapIdx[p]], st, lut);
        }
    }
    for (int i = 0; i < 12; i++) c.al.rel(bufs[i]);
    return ok;
}

// ---------------------------------------------------------------------------
// 2DTL (reference.py:_tile2d_chunk; dead Tile2D_* decoders in
// YAIK_3DTile.cpp:2145-3809 - claim handling follows the ENCODER's model,
// see the documented deviation in reference.py:_tile2d_size_pass)
// ---------------------------------------------------------------------------
bool tile2d_pass(Ctx& c, int pa, int pb, int sx, int sy, const u8* bitmap,
                 size_t bmAvail, T3Streams& st, const ExpandedLut& lut) {
    int tw = 1 << sx, th = 1 << sy;
    Scan sc;
    if (!scan_spec(sx, sy, c.w, c.h, &sc)) return false;
    size_t bmBytes = bitmap_bytes(sc);
    if (bmAvail < bmBytes) { set_error(YAIK_INVALID_STREAM); return false; }
    PairOrder po;
    pair_order(sx, sy, &po);
    c.split_masks();
    u8* clA = c.claims[pa];
    u8* clB = c.claims[pb];

    for (int i = 0; i < sc.total; i++) {
        if (!((bitmap[i >> 3] >> (i & 7)) & 1)) continue;
        int tx, ty;
        scan_coord(sc, i, &tx, &ty);
        if (tx * tw >= c.w || ty * th >= c.h) continue;
        int x = tx * tw, y = ty * th;
        if (x + tw > c.w8 || y + th > c.h8 ||
            (y / 4 + th / 4) > c.qh || (x / 4 + tw / 4) > c.qw) {
            set_error(YAIK_INVALID_STREAM);
            return false;
        }
        if (st.curColor + 4 > st.colorCnt || st.curType + 1 > st.typeCnt) {
            set_error(YAIK_INVALID_STREAM);
            return false;
        }
        const u8* ab = st.colors + st.curColor; st.curColor += 4;
        u16 tileType = (u16)(st.types[st.curType * 2]
                             | (st.types[st.curType * 2 + 1] << 8));
        st.curType++;
        int combined = tileType & 0x3FFF;
        int bit = ((tileType >> 14) & 3) + 3;
        int bi = bit - 3;
        size_t rowLen = (size_t)2 << bit;
        size_t rows = (size_t)lut.tables * 8;
        if ((size_t)combined >= rows) combined = (int)rows - 1;
        // flat section semantics: 3-bit tiles legitimately overrun their
        // block into the NEXT pattern's entries (encoder idx3Bit quirk,
        // EncoderContext.cpp:5642); clamp only at the section end
        const u8* flat = lut.bits[bi];
        size_t flatLen = (size_t)lut.tables * 8 * rowLen;
        size_t base = (size_t)combined * rowLen;
        int mn[2] = {ab[0], ab[1]};
        int diff[2] = {ab[2] - ab[0], ab[3] - ab[1]};
        const u8* stream = st.idx[bi];
        size_t cur = st.curIdx[bi], streamLen = st.idxLen[bi];
        int qx0 = x / 4, qy0 = y / 4;

        for (int g = 0; g < po.n; g++) {
            const QuadGroup& q = po.g[g];
            int px = x + q.q0x * 4, py = y + q.q0y * 4;
            int wpx;
            if (q.n == 2) {
                size_t i0 = (size_t)(qy0 + q.q0y) * c.qw + qx0 + q.q0x;
                size_t i1 = (size_t)(qy0 + q.q0y) * c.qw + qx0 + q.q1x;
                bool b0 = clA[i0] | clB[i0];
                bool b1 = clA[i1] | clB[i1];
                if (!b0 && !b1) wpx = 2;
                else if (!b0) wpx = 1;
                else if (!b1) { wpx = 1; px += 4; }
                else wpx = 0;
            } else {
                size_t i0 = (size_t)(qy0 + q.q0y) * c.qw + qx0 + q.q0x;
                wpx = (clA[i0] | clB[i0]) ? 0 : 1;
            }
            if (!wpx) continue;
            int npx = 16 * wpx;
            if (cur + npx > streamLen) { set_error(YAIK_INVALID_STREAM); return false; }
            for (int k = 0; k < npx; k++) {
                size_t idx = base + stream[cur + k];
                if (idx > flatLen - 2) idx = flatLen - 2;
                int dy = k / (wpx * 4), dx = k % (wpx * 4);
                u8* dA = c.planes[pa] + (size_t)(py + dy) * c.w8 + px + dx;
                u8* dB = c.planes[pb] + (size_t)(py + dy) * c.w8 + px + dx;
                *dA = (u8)(mn[0] + ((diff[0] * (int)flat[idx]) >> 7));
                *dB = (u8)(mn[1] + ((diff[1] * (int)flat[idx + 1]) >> 7));
            }
            cur += npx;
        }
        st.curIdx[bi] = cur;
        for (int dy = 0; dy < th / 4; dy++) {
            memset(clA + (size_t)(qy0 + dy) * c.qw + qx0, 1, tw / 4);
            memset(clB + (size_t)(qy0 + dy) * c.qw + qx0, 1, tw / 4);
        }
    }
    return true;
}

bool decode_t2dl(Ctx& c, const u8* body, u32 blen, const ExpandedLut& lut) {
    if (blen < sizeof(Tile3DHeader)) { set_error(YAIK_INVALID_HEADER); return false; }
    Tile3DHeader h; memcpy(&h, body, sizeof h);
    body += sizeof(Tile3DHeader); blen -= sizeof(Tile3DHeader);
    if (!lut.tables) { set_error(YAIK_INVALID_LUT); return false; }
    int pa, pb;
    if (h.component == 3) { pa = 0; pb = 1; }
    else if (h.component == 6) { pa = 1; pb = 2; }
    else if (h.component == 5) { pa = 0; pb = 2; }
    else { set_error(YAIK_INVALID_PLANE_ID); return false; }

    // stream order: idx 3..6, type, color, 8x8 map, 4x4 map
    const u32 csize[8] = {h.cmp3, h.cmp4, h.cmp5, h.cmp6, h.cmpType,
                          h.cmpColor, h.map8_8c, h.map4_4c};
    const u32 usize[8] = {h.cnt3, h.cnt4, h.cnt5, h.cnt6, h.typeCnt * 2u,
                          h.colorCnt, h.map8_8, h.map4_4};
    u64 totalC = 0;
    for (int i = 0; i < 8; i++) totalC += csize[i];
    if (totalC > blen) { set_error(YAIK_INVALID_STREAM); return false; }
    size_t totalPx = (size_t)c.w8 * c.h8;
    u8* bufs[8] = {nullptr};
    bool ok = true;
    u32 off = 0;
    for (int i = 0; i < 8 && ok; i++) {
        size_t guard = (i < 4) ? totalPx : (i == 5 ? totalPx * 4 : 0);
        bufs[i] = (u8*)c.al.zmem((size_t)usize[i] + guard + 1);
        if (!bufs[i]) { ok = false; break; }
        if (csize[i]) ok = zdec(body + off, csize[i], bufs[i], usize[i]);
        else if (usize[i]) ok = false;
        if (!ok) set_error(YAIK_INVALID_DECOMPRESSION);
        off += csize[i];
    }
    if (ok) {
        full_range_remap(bufs[5], usize[5], h.colorRate);
        T3Streams st;
        st.colors = bufs[5]; st.colorCnt = (size_t)usize[5] + totalPx * 4;
        st.types = bufs[4]; st.typeCnt = h.typeCnt;
        for (int b = 0; b < 4; b++) {
            st.idx[b] = bufs[b];
            st.idxLen[b] = (size_t)usize[b] + totalPx;
        }
        const int order[2][2] = {{3, 3}, {2, 2}};
        const int mapIdx[2] = {6, 7};
        u64 security = 0;
        for (int p = 0; p < 2 && ok; p++) {
            if (!usize[mapIdx[p]]) continue;
            Scan sc;
            if (!scan_spec(order[p][0], order[p][1], c.w, c.h, &sc)) {
                ok = false; set_error(YAIK_INVALID_STREAM); break;
            }
            size_t bm = bitmap_bytes(sc);
            if (usize[mapIdx[p]] < bm) { ok = false; set_error(YAIK_INVALID_STREAM); break; }
            security += popcount_bytes(bufs[mapIdx[p]], bm);
            if (security > h.typeCnt) continue;
            ok = tile2d_pass(c, pa, pb, order[p][0], order[p][1],
                             bufs[mapIdx[p]], usize[mapIdx[p]], st, lut);
        }
    }
    for (int i = 0; i < 8; i++) c.al.rel(bufs[i]);
    return ok;
}

// ---------------------------------------------------------------------------
// 1DTL (reference.py:_tile1d_chunk; Decompress1D YAIK_3DTile.cpp:24-240)
// ---------------------------------------------------------------------------
bool decode_t1dl(Ctx& c, const u8* body, u32 blen) {
    if (blen < sizeof(Header1D)) { set_error(YAIK_INVALID_HEADER); return false; }
    Header1D h; memcpy(&h, body, sizeof h);
    body += sizeof(Header1D); blen -= sizeof(Header1D);
    if ((u64)h.typZ + h.pixZ > blen) { set_error(YAIK_INVALID_STREAM); return false; }
    if (h.compressionRange == 0) { set_error(YAIK_INVALID_STREAM); return false; }
    size_t totalTiles = (size_t)(c.w8 / 8) * (c.h8 / 8);
    u8* types = (u8*)c.al.zmem((size_t)h.typU + totalTiles * 9 + 3);
    u8* pix = (u8*)c.al.zmem((size_t)h.pixU + totalTiles * 64 * 3 + 32);
    bool ok = types && pix;
    if (ok) ok = zdec(body, h.typZ, types, h.typU)
             && zdec(body + h.typZ, h.pixZ, pix, h.pixU);
    if (ok) {
        c.split_masks();
        s64 invRange = (1LL << 24) / h.compressionRange;
        size_t tcur = 0, pcur = 0;
        for (int p = 0; p < 3; p++) {
            u8* claims = c.claims[p];
            u8* plane = c.planes[p];
            for (int y = 0; y < c.h; y += 8) {
                for (int x = 0; x < c.w; x += 8) {
                    int qx0 = x / 4, qy0 = y / 4;
                    bool q00 = claims[(size_t)qy0 * c.qw + qx0];
                    bool q01 = claims[(size_t)qy0 * c.qw + qx0 + 1];
                    bool q10 = claims[(size_t)(qy0 + 1) * c.qw + qx0];
                    bool q11 = claims[(size_t)(qy0 + 1) * c.qw + qx0 + 1];
                    if (q00 && q01 && q10 && q11) continue;
                    int color0 = types[tcur], base = types[tcur + 1];
                    int delta = types[tcur + 2];
                    tcur += 3;
                    s64 delta2 = ((delta * invRange) >> 8) + 1;
                    for (int gy = 0; gy < 2; gy++) {
                        bool b0 = gy ? q10 : q00;
                        bool b1 = gy ? q11 : q01;
                        int py = y + gy * 4, px = x, wq = 0;
                        if (!b0 && !b1) wq = 2;
                        else if (!b0) wq = 1;
                        else if (!b1) { wq = 1; px += 4; }
                        if (!wq) continue;
                        int npx = 16 * wq;
                        for (int k = 0; k < npx; k++) {
                            int L = pix[pcur + k];
                            int dy = k / (wq * 4), dx = k % (wq * 4);
                            plane[(size_t)(py + dy) * c.w8 + px + dx] =
                                L ? (u8)(base + (((L - 1) * delta2) >> 16))
                                  : (u8)color0;
                        }
                        pcur += npx;
                    }
                }
            }
        }
    }
    c.al.rel(types); c.al.rel(pix);
    return ok;
}

// ---------------------------------------------------------------------------
// MIPM + ALPM (decoder/alpha.py; YAIK_Mipmap.cpp / YAIK_Alpha.cpp)
// ---------------------------------------------------------------------------
bool decode_mipm(Ctx& c, const u8* body, u32 blen) {
    if (blen < sizeof(MipmapHeader)) { set_error(YAIK_INVALID_HEADER); return false; }
    MipmapHeader h; memcpy(&h, body, sizeof h);
    if ((1 << h.level) != 16) { set_error(YAIK_INVALID_MIPMAP_LEVEL); return false; }
    const u8* bits = body + sizeof(MipmapHeader);
    s64 ntiles = (s64)h.w * h.h;
    if (ntiles < 0 || (u64)sizeof(MipmapHeader) + (ntiles + 7) / 8 > blen) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    int ts = 16;
    s64 y0 = (s64)h.y * ts, x0 = (s64)h.x * ts;
    if (y0 >= c.h || x0 >= c.w || x0 < 0 || y0 < 0) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    if (!c.mipMask) c.mipMask = (u8*)c.al.zmem((size_t)c.h * c.w);
    if (!c.mipMask) return false;
    memset(c.mipMask, 0, (size_t)c.h * c.w);
    // expansion may overhang a non-multiple-of-16 edge; clip
    for (s64 tyi = 0; tyi < h.h; tyi++) {
        for (s64 txi = 0; txi < h.w; txi++) {
            s64 b = tyi * h.w + txi;
            if (!((bits[b >> 3] >> (b & 7)) & 1)) continue;
            for (int dy = 0; dy < ts; dy++) {
                s64 yy = y0 + tyi * ts + dy;
                if (yy >= c.h) break;
                for (int dx = 0; dx < ts; dx++) {
                    s64 xx = x0 + txi * ts + dx;
                    if (xx >= c.w) break;
                    c.mipMask[yy * c.w + xx] = 1;
                }
            }
        }
    }
    return true;
}

// 6-bit unpack: 4 values per 3 bytes; v8 = (v<<2)|(v>>4) (YAIK_Alpha.cpp)
void unpack6(const u8* raw, size_t rawLen, size_t count, bool inverse,
             u8* out) {
    size_t bytePos = 0;
    for (size_t i = 0; i < count; i += 4) {
        u32 b0 = bytePos < rawLen ? raw[bytePos] : 0;
        u32 b1 = bytePos + 1 < rawLen ? raw[bytePos + 1] : 0;
        u32 b2 = bytePos + 2 < rawLen ? raw[bytePos + 2] : 0;
        bytePos += 3;
        u32 v[4] = {b0 & 0x3F, (b0 >> 6) | ((b1 & 0xF) << 2),
                    (b1 >> 4) | ((b2 & 0x3) << 4), b2 >> 2};
        for (int k = 0; k < 4 && i + k < count; k++) {
            u32 x = inverse ? 63 - v[k] : v[k];
            out[i + k] = (u8)((x << 2) | (x >> 4));
        }
    }
}

bool decode_alpm(Ctx& c, const u8* body, u32 blen) {
    if (blen < sizeof(AlphaHeader)) { set_error(YAIK_INVALID_HEADER); return false; }
    AlphaHeader h; memcpy(&h, body, sizeof h);
    if ((u64)sizeof(AlphaHeader) + h.streamSize > blen) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    if (h.x < 0 || h.y < 0 || h.w <= 0 || h.h <= 0 ||
        h.x + h.w > c.w || h.y + h.h > c.h) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    u8* raw = (u8*)c.al.mem(h.expectedSize ? h.expectedSize : 1);
    if (!raw) return false;
    if (!zdec(body + sizeof(AlphaHeader), h.streamSize, raw, h.expectedSize)) {
        c.al.rel(raw);
        return false;
    }
    if (!c.alpha) c.alpha = (u8*)c.al.zmem((size_t)c.h * c.w);
    if (!c.alpha) { c.al.rel(raw); return false; }
    memset(c.alpha, 0, (size_t)c.h * c.w);
    int mode = h.parameters & 7;
    size_t bpx = (size_t)h.w * h.h;
    bool ok = true;
    if (mode == 1) {                                    // IS_1_BIT_FULL
        c.alpha1bit = true;
        if ((bpx + 7) / 8 > h.expectedSize) ok = false;
        else
            for (size_t i = 0; i < bpx; i++)
                c.alpha[(size_t)(h.y + i / h.w) * c.w + h.x + i % h.w] =
                    ((raw[i >> 3] >> (i & 7)) & 1) ? 255 : 0;
    } else if (mode == 4 || mode == 5) {                // IS_6_BIT_FULL[_INV]
        u8* vals = (u8*)c.al.mem(bpx);
        if (!vals) ok = false;
        else {
            unpack6(raw, h.expectedSize, bpx, mode == 5, vals);
            for (size_t i = 0; i < bpx; i++)
                c.alpha[(size_t)(h.y + i / h.w) * c.w + h.x + i % h.w] = vals[i];
            c.al.rel(vals);
        }
    } else if (mode == 2 || mode == 3) {    // IS_6_BIT_USEMIPMAPMASK[_INV]
        if (!c.mipMask) { set_error(YAIK_INVALID_ALPHA_FORMAT); ok = false; }
        else {
            size_t nsel = 0;
            for (s32 yy = 0; yy < h.h; yy++)
                for (s32 xx = 0; xx < h.w; xx++)
                    nsel += c.mipMask[(size_t)(h.y + yy) * c.w + h.x + xx];
            u8* vals = (u8*)c.al.mem(nsel ? nsel : 1);
            if (!vals) ok = false;
            else {
                unpack6(raw, h.expectedSize, nsel, mode == 3, vals);
                size_t vi = 0;
                for (s32 yy = 0; yy < h.h; yy++)
                    for (s32 xx = 0; xx < h.w; xx++)
                        if (c.mipMask[(size_t)(h.y + yy) * c.w + h.x + xx])
                            c.alpha[(size_t)(h.y + yy) * c.w + h.x + xx] =
                                vals[vi++];
                c.al.rel(vals);
            }
        }
    } else if (mode == 6) {                             // IS_8_BIT_FULL
        if (bpx > h.expectedSize) ok = false;
        else
            for (s32 yy = 0; yy < h.h; yy++)
                memcpy(c.alpha + (size_t)(h.y + yy) * c.w + h.x,
                       raw + (size_t)yy * h.w, h.w);
    } else {
        set_error(YAIK_INVALID_ALPHA_FORMAT);
        ok = false;
    }
    if (!ok && g_error.load() == YAIK_NO_ERROR) set_error(YAIK_INVALID_STREAM);
    c.al.rel(raw);
    return ok;
}

// ---------------------------------------------------------------------------
// UCOL (reference.py:_ucol_chunk / decode_ucol_map; encoder pass
// SingleColorOut EncoderContext.cpp:1771-2283)
// ---------------------------------------------------------------------------
bool decode_ucol(Ctx& c, const u8* body, u32 blen) {
    if (blen < sizeof(UcolHeader)) { set_error(YAIK_INVALID_HEADER); return false; }
    UcolHeader h; memcpy(&h, body, sizeof h);
    if (h.x < 0 || h.y < 0 || h.w <= 0 || h.h <= 0 ||
        h.x + h.w > c.w || h.y + h.h > c.h) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    if (h.version == 2 && ((h.w % 8) || (h.h % 8))) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    int nColors = h.colorCount ? h.colorCount - 1 : 255;
    const u8* p = body + sizeof(UcolHeader);
    u32 rem = blen - sizeof(UcolHeader);
    if ((u64)nColors * 3 + h.mapZ + h.spanZ > rem) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    const u8* pal = p;
    const u8* zmap = p + (size_t)nColors * 3;
    const u8* zspan = zmap + h.mapZ;
    u8* stream = (u8*)c.al.mem(h.mapU ? h.mapU : 1);
    u8* spans = (u8*)c.al.mem(h.spanU ? h.spanU : 1);
    bool ok = stream && spans;
    if (ok) ok = zdec(zmap, h.mapZ, stream, h.mapU)
             && zdec(zspan, h.spanZ, spans, h.spanU);
    if (ok) {
        size_t mapSize = (size_t)h.w * h.h;
        u8* mapPixel = (u8*)c.al.zmem(mapSize);
        if (!mapPixel) ok = false;
        else {
            // span replay (verifyComp, EncoderContext.cpp:1749)
            size_t pos = 0, cur = 0;
            for (u32 si = 0; ok && si + 8 <= h.spanU; si += 8) {
                u32 delta, length;
                memcpy(&delta, spans + si, 4);
                memcpy(&length, spans + si + 4, 4);
                pos += delta;
                if (pos + length > mapSize || cur + length > h.mapU) {
                    set_error(YAIK_INVALID_STREAM);
                    ok = false;
                    break;
                }
                memcpy(mapPixel + pos, stream + cur, length);
                cur += length;
            }
            if (ok) {
                int wu = h.w >> 3;
                for (size_t n = 0; ok && n < mapSize; n++) {
                    u8 v = mapPixel[n];
                    if (!v) continue;
                    if (v > nColors) { set_error(YAIK_INVALID_STREAM); ok = false; break; }
                    size_t x, y;
                    if (h.version == 2) {   // swizzled 8x8
                        size_t tile = n >> 6;
                        x = ((tile % wu) << 3) | (n & 7);
                        y = ((tile / wu) << 3) | ((n >> 3) & 7);
                    } else {
                        x = n % h.w; y = n / h.w;
                    }
                    const u8* col = pal + (size_t)(v - 1) * 3;
                    size_t di = (size_t)(h.y + y) * c.w8 + h.x + x;
                    c.planes[0][di] = col[0];
                    c.planes[1][di] = col[1];
                    c.planes[2][di] = col[2];
                }
            }
            c.al.rel(mapPixel);
        }
    }
    c.al.rel(stream); c.al.rel(spans);
    return ok;
}

// ---------------------------------------------------------------------------
// SMAP (reference.py:_smap_chunk / decode_smap_seeds; dead SmoothMap pass
// EncoderContext.cpp:2564-2764, tag deprecated YAIK_API.cpp:569)
// ---------------------------------------------------------------------------
bool decode_smap(Ctx& c, const u8* body, u32 blen) {
    if (blen < sizeof(SmapHeader)) { set_error(YAIK_INVALID_HEADER); return false; }
    SmapHeader h; memcpy(&h, body, sizeof h);
    const u8* p = body + sizeof(SmapHeader);
    u32 rem = blen - sizeof(SmapHeader);
    if ((u64)h.mapZ + h.rgbZ > rem || h.w < 0 || h.h < 0 ||
        h.x < 0 || h.y < 0) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    s64 qh = c.h / 2, qw = c.w / 2;
    if (!qh || !qw) { set_error(YAIK_INVALID_STREAM); return false; }
    s64 nBits = (s64)h.w * h.h;
    size_t rawLen = (size_t)((nBits + 7) >> 3);
    u8* raw = (u8*)c.al.zmem(rawLen ? rawLen : 1);
    u8* rgb = (u8*)c.al.zmem(h.rgbU ? h.rgbU : 1);
    bool ok = raw && rgb;
    if (ok && h.mapZ) ok = zdec(p, h.mapZ, raw, rawLen);
    if (ok && h.rgbZ) ok = zdec(p + h.mapZ, h.rgbZ, rgb, h.rgbU);
    if (ok) {
        s32* q = (s32*)c.al.zmem((size_t)qh * qw * 4);
        if (!q) ok = false;
        else {
            for (s64 b = 0; b < nBits; b++) {
                s64 xs = h.x + b % h.w, ys = h.y + b / h.w;
                s64 idx = xs + ys * qw;
                if (idx >= 0 && idx < qh * qw)
                    q[idx] = ((raw[b >> 3] >> (b & 7)) & 1) * 255;
            }
            // seed enumeration with the encoder's clamped reads and
            // in-buffer 128 markers (decode_smap_seeds quirk replication)
            size_t cur = 0;
            for (int y = 0; y < c.h; y += 4) {
                for (int x = 0; x < c.w; x += 4) {
                    s64 cx = x < qw ? x : qw - 1;
                    s64 cy = y < qh ? y : qh - 1;
                    if (!q[cy * qw + cx]) continue;
                    s64 mark = (s64)x + (s64)y * qw;
                    if (mark < qw * qh) q[mark] = 128;
                    if (cur + 3 <= h.rgbU) {
                        // Co/Cg stored as wrapped bytes; YCoCgtoRGB (:103)
                        int Y = rgb[cur];
                        int co = 2 * ((int)((rgb[cur + 1] + 128) % 256) - 128);
                        int cg = 2 * ((int)((rgb[cur + 2] + 128) % 256) - 128);
                        int tmp = Y - cg / 2;
                        int G = cg + tmp;
                        int B = tmp - co / 2;
                        int R = B + co;
                        size_t di = (size_t)y * c.w8 + x;
                        c.planes[0][di] = (u8)R;
                        c.planes[1][di] = (u8)G;
                        c.planes[2][di] = (u8)B;
                    }
                    cur += 3;
                }
            }
            c.al.rel(q);
        }
    }
    c.al.rel(raw); c.al.rel(rgb);
    return ok;
}

// ---------------------------------------------------------------------------
// PLNT: structure-validate and skip (the reference never shipped a PLNT
// decoder - tag deprecated YAIK_API.cpp:567; reference.py does the same)
// ---------------------------------------------------------------------------
bool decode_plnt(Ctx& c, const u8* body, u32 blen) {
    if (blen < sizeof(PlntHeader)) { set_error(YAIK_INVALID_HEADER); return false; }
    PlntHeader h; memcpy(&h, body, sizeof h);
    const u8* p = body + sizeof(PlntHeader);
    u32 rem = blen - sizeof(PlntHeader);
    if ((u64)h.mapZ + h.strZ > rem) { set_error(YAIK_INVALID_STREAM); return false; }
    unsigned long long fcs = ZSTD_getFrameContentSize(p, h.mapZ);
    u64 maxTiles = (u64)(h.w / 8) * (h.h / 8) * 2;
    if (fcs == ZSTD_CONTENTSIZE_UNKNOWN || fcs == ZSTD_CONTENTSIZE_ERROR ||
        fcs > maxTiles) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    u8* t = (u8*)c.al.mem(fcs ? fcs : 1);
    u8* s = (u8*)c.al.mem(h.strU ? h.strU : 1);
    bool ok = t && s && zdec(p, h.mapZ, t, fcs)
              && zdec(p + h.mapZ, h.strZ, s, h.strU);
    c.al.rel(t); c.al.rel(s);
    return ok;
}

// ---------------------------------------------------------------------------
// Output (default interleave = internal_imageBuilderFunc semantics,
// YAIK_DefaultCallback.cpp:24-191, over de-swizzled planes)
// ---------------------------------------------------------------------------
void emit_default(Ctx& c, YAIK_SDecodedImage* out) {
    int comps = out->hasAlpha ? 4 : 3;
    s32 stride = out->outputImageStride;
    if (stride == 0) stride = c.w * comps;
    for (int y = 0; y < c.h; y++) {
        u8* dst = out->outputImage + (size_t)y * stride;
        const u8* r = c.planes[0] + (size_t)y * c.w8;
        const u8* g = c.planes[1] + (size_t)y * c.w8;
        const u8* b = c.planes[2] + (size_t)y * c.w8;
        if (comps == 4) {
            const u8* a = c.alpha ? c.alpha + (size_t)y * c.w : nullptr;
            for (int x = 0; x < c.w; x++) {
                dst[x * 4] = r[x]; dst[x * 4 + 1] = g[x];
                dst[x * 4 + 2] = b[x]; dst[x * 4 + 3] = a ? a[x] : 255;
            }
        } else {
            for (int x = 0; x < c.w; x++) {
                dst[x * 3] = r[x]; dst[x * 3 + 1] = g[x];
                dst[x * 3 + 2] = b[x];
            }
        }
    }
}

// custom callback contract: 8x8-tile-swizzled planes (YAIK.h:205-224)
bool emit_custom(Ctx& c, YAIK_SDecodedImage* out) {
    int tilesX = c.w8 / 8, tilesY = c.h8 / 8;
    size_t planeBytes = (size_t)tilesX * tilesY * 64;
    u8* sw[3];
    for (int p = 0; p < 3; p++) {
        sw[p] = (u8*)c.al.mem(planeBytes);
        if (!sw[p]) {
            for (int q = 0; q < p; q++) c.al.rel(sw[q]);
            return false;
        }
        for (int ty = 0; ty < tilesY; ty++)
            for (int tx = 0; tx < tilesX; tx++)
                for (int dy = 0; dy < 8; dy++)
                    memcpy(sw[p] + ((size_t)ty * tilesX + tx) * 64 + dy * 8,
                           c.planes[p] + (size_t)(ty * 8 + dy) * c.w8 + tx * 8,
                           8);
    }
    u8* alpha = nullptr;
    if (out->hasAlpha) {
        alpha = c.alpha;
        if (!alpha) {
            alpha = (u8*)c.al.mem((size_t)c.h * c.w);
            if (alpha) memset(alpha, 255, (size_t)c.h * c.w);
        }
    }
    YAIK_SCustomDataSource src;
    src.planeR = sw[0]; src.planeG = sw[1]; src.planeB = sw[2];
    src.planeA = alpha;
    src.strideR = src.strideG = src.strideB = tilesX * 64;
    src.strideA = c.w;
    out->customImageOutput(out, &src);
    for (int p = 0; p < 3; p++) c.al.rel(sw[p]);
    if (alpha && alpha != c.alpha) c.al.rel(alpha);
    return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// Public API
// ---------------------------------------------------------------------------
extern "C" {

YAIK_LIB YAIK_Init(u8 maxDecodeThreadContext,
                   YAIK_SMemAlloc* libraryMemAllocator) {
    if (maxDecodeThreadContext == 0) {
        set_error(YAIK_INVALID_CONTEXT_COUNT);
        return nullptr;
    }
    if (libraryMemAllocator &&
        (!libraryMemAllocator->customAlloc || !libraryMemAllocator->customFree)) {
        set_error(YAIK_INIT_FAIL);
        return nullptr;
    }
    Alloc al = make_alloc(libraryMemAllocator);
    void* mem = al.mem(sizeof(Lib));
    if (!mem) return nullptr;
    Lib* lib = new (mem) Lib();
    lib->alloc = al;
    lib->maxInst = maxDecodeThreadContext;
    void* im = al.zmem(sizeof(Instance) * lib->maxInst);
    if (!im) { lib->~Lib(); al.rel(mem); return nullptr; }
    lib->inst = new (im) Instance[lib->maxInst];
    for (int i = 0; i < lib->maxInst; i++) lib->inst[i].lib = lib;
    return lib;
}

void YAIK_AssignLUT(YAIK_LIB h, u8* lutData, u32 lutDataLength) {
    Lib* lib = as_lib(h);
    if (!lib) return;
    if (!lutData || lutDataLength < sizeof(LutFileHeader)) {
        set_error(YAIK_INVALID_LUT);
        return;
    }
    if (tag_is((const char*)lutData, "LUL0")) {
        if (lib->has3d) free_lut(&lib->lut3d, lib->alloc);
        lib->has3d = expand_lut3d(lutData, lutDataLength, lib->alloc,
                                  &lib->lut3d);
        if (!lib->has3d) free_lut(&lib->lut3d, lib->alloc);
    } else if (tag_is((const char*)lutData, "LU20")) {
        if (lib->has2d) free_lut(&lib->lut2d, lib->alloc);
        lib->has2d = expand_lut2d(lutData, lutDataLength, lib->alloc,
                                  &lib->lut2d);
        if (!lib->has2d) free_lut(&lib->lut2d, lib->alloc);
    } else {
        set_error(YAIK_INVALID_LUT);
    }
}

void YAIK_Release(YAIK_LIB h) {
    Lib* lib = (Lib*)h;
    if (!lib || lib->magic != LIB_MAGIC) {
        set_error(YAIK_RELEASE_EMPTY_LIBRARY);
        return;
    }
    Alloc al = lib->alloc;
    free_lut(&lib->lut3d, al);
    free_lut(&lib->lut2d, al);
    lib->magic = 0;
    for (int i = 0; i < lib->maxInst; i++) lib->inst[i].~Instance();
    al.rel(lib->inst);
    lib->~Lib();
    al.rel(lib);
}

bool YAIK_DecodeImagePre(YAIK_LIB h, void* stream, u32 streamLength,
                         YAIK_SDecodedImage* info) {
    Lib* lib = as_lib(h);
    if (!lib) return false;
    if (!info) { set_error(YAIK_INVALID_STREAM); return false; }
    if (!stream || streamLength <= sizeof(FileHeader)) {
        set_error(YAIK_INVALID_STREAM);
        return false;
    }
    FileHeader fh;
    memcpy(&fh, stream, sizeof fh);
    if (!tag_is(fh.tag, "YAIK")) {
        set_error(YAIK_INVALID_HEADER);
        return false;
    }
    Instance* slot = nullptr;
    {
        std::lock_guard<std::mutex> g(lib->poolMutex);
        for (int i = 0; i < lib->maxInst; i++)
            if (!lib->inst[i].used) { slot = &lib->inst[i]; break; }
        if (!slot) {
            set_error(YAIK_NO_EMPTYDECODE_SLOT);
            return false;
        }
        slot->used = true;
    }
    slot->stream = stream;
    slot->length = streamLength;
    slot->width = fh.width;
    slot->height = fh.height;
    slot->hasAlpha = (fh.infoMask & 1) != 0;
    info->width = fh.width;
    info->height = fh.height;
    info->hasAlpha = slot->hasAlpha;
    info->customImageOutput = nullptr;
    info->userContextCustomImage = nullptr;
    info->userMemoryAllocator.customAlloc = nullptr;
    info->userMemoryAllocator.customFree = nullptr;
    info->userMemoryAllocator.customContext = nullptr;
    info->outputImage = nullptr;
    info->outputImageStride = 0;
    info->hasAlpha1Bit = false;
    info->internalTag = slot;
    return true;
}

bool YAIK_DecodeImage(void* stream, u32 streamLength,
                      YAIK_SDecodedImage* info) {
    if (!info || !info->internalTag) {
        set_error(YAIK_DECIMG_INVALIDCTX);
        return false;
    }
    Instance* slot = (Instance*)info->internalTag;
    Lib* lib = slot->lib;
    if (!lib || lib->magic != LIB_MAGIC || !slot->used) {
        set_error(YAIK_DECIMG_INVALIDCTX);
        return false;
    }
    struct SlotRelease {   // slot is released in ALL cases (YAIK.h:88)
        Instance* s;
        ~SlotRelease() { s->used = false; s->stream = nullptr; }
    } rel{slot};
    info->internalTag = nullptr;
    if (slot->stream != stream || slot->length != streamLength) {
        set_error(YAIK_DECIMG_DIFFSTREAM);
        return false;
    }
    if (!info->outputImage && !info->customImageOutput) {
        set_error(YAIK_DECIMG_BUFFERNOTSET);
        return false;
    }
    Alloc al = make_alloc(&info->userMemoryAllocator);
    Ctx c;
    if (!c.init(slot->width, slot->height, al)) return false;

    const u8* s = (const u8*)stream;
    u32 off = sizeof(FileHeader);
    bool sawEnd = false;
    while (true) {
        if (off + 4 > streamLength) { set_error(YAIK_INVALID_STREAM); return false; }
        u32 tag32;
        memcpy(&tag32, s + off, 4);
        if (tag32 == END_TAG) { sawEnd = true; break; }
        if (off + sizeof(ChunkHeader) > streamLength) {
            set_error(YAIK_INVALID_STREAM);
            return false;
        }
        ChunkHeader ch;
        memcpy(&ch, s + off, sizeof ch);
        u64 bodyStart = off + sizeof(ChunkHeader);
        if (bodyStart + ch.length > streamLength) {
            set_error(YAIK_INVALID_STREAM);
            return false;
        }
        const u8* body = s + bodyStart;
        bool ok;
        if (tag_is(ch.tag, "GTIL")) ok = decode_gtil(c, body, ch.length);
        else if (tag_is(ch.tag, "3DTL")) {
            ok = decode_t3dl(c, body, ch.length, false, lib->lut3d);
        } else if (tag_is(ch.tag, "3DTX")) {
            ok = decode_t3dl(c, body, ch.length, true, lib->lut3d);
        } else if (tag_is(ch.tag, "2DTL")) {
            ok = decode_t2dl(c, body, ch.length, lib->lut2d);
        } else if (tag_is(ch.tag, "1DTL")) ok = decode_t1dl(c, body, ch.length);
        else if (tag_is(ch.tag, "MIPM")) ok = decode_mipm(c, body, ch.length);
        else if (tag_is(ch.tag, "ALPM")) ok = decode_alpm(c, body, ch.length);
        else if (tag_is(ch.tag, "UCOL")) ok = decode_ucol(c, body, ch.length);
        else if (tag_is(ch.tag, "SMAP")) ok = decode_smap(c, body, ch.length);
        else if (tag_is(ch.tag, "PLNT")) ok = decode_plnt(c, body, ch.length);
        else { set_error(YAIK_INVALID_TAG_ID); ok = false; }
        if (!ok) return false;
        off = (u32)(bodyStart + ch.length);
    }
    (void)sawEnd;
    info->hasAlpha1Bit = c.alpha1bit;
    if (info->customImageOutput) return emit_custom(c, info);
    emit_default(c, info);
    return true;
}

enum YAIK_ERROR_CODE YAIK_GetErrorCode(void) {
    return (YAIK_ERROR_CODE)g_error.exchange(YAIK_NO_ERROR);
}

}  // extern "C"
