/* yaik_tpu host decoder library - public C interface.
 *
 * API-compatible with the reference decoder's public surface
 * (reference include/YAIK.h:52-143): same entry points, same parameter
 * and struct layouts, same error-code ordering, so existing callers can
 * relink against libyaik_tpu. The implementation is this repo's own
 * (yaik_capi.cpp); pixel output is bit-identical to the repo's host
 * decoder (yaik_tpu/decoder/reference.py), which is itself validated
 * byte-for-byte against reference-decoded fixtures.
 *
 * Extensions over the reference surface:
 *   - YAIK_AssignLUT accepts both 'LUL0' (3D) and 'LU20' (2D) LUT files,
 *     dispatching on the tag; assign each at most once.
 *   - '3DTX' (u32 map sizes, >= 1 MPix images), 'UCOL', 'SMAP' and plane-
 *     subset 'GTIL' chunks decode (the reference deprecates or lacks them).
 *   - The instance pool is mutex-protected (the reference leaves slot
 *     management thread-unsafe, decoder/YAIK_API.cpp:59).
 */
#ifndef YAIK_TPU_PUBLIC_HEADER
#define YAIK_TPU_PUBLIC_HEADER

#include <stddef.h>
#include <inttypes.h>
#ifndef __cplusplus
#include <stdbool.h>
#endif

typedef uint8_t  u8;
typedef int8_t   s8;
typedef uint16_t u16;
typedef int16_t  s16;
typedef uint32_t u32;
typedef int32_t  s32;
typedef uint64_t u64;
typedef int64_t  s64;

typedef void* YAIK_LIB;
typedef void* YAIK_INSTANCE;

struct YAIK_SDecodedImage;
struct YAIK_SMemAlloc;
struct YAIK_SCustomDataSource;

#ifdef __cplusplus
extern "C" {
#endif

/* Library-wide allocator (library bookkeeping only; per-decode allocation
 * is configured on YAIK_SDecodedImage). customFree must accept NULL. */
typedef void* (*YAIK_allocFunc)(void* customContext, size_t size);
typedef void  (*YAIK_freeFunc)(void* customContext, void* address);

struct YAIK_SMemAlloc {
#ifdef __cplusplus
    YAIK_SMemAlloc() : customAlloc(0), customFree(0), customContext(0) {}
#endif
    YAIK_allocFunc customAlloc;
    YAIK_freeFunc  customFree;
    void*          customContext;
};

/* Custom output callback: receives the decoded planes.
 * planeR/G/B are 8x8-tile-swizzled (64 contiguous bytes per tile, tiles
 * left-to-right then top-to-bottom; image padded to a multiple of 8);
 * strideR/G/B are the byte distance to the next TILE row. planeA, when
 * present, is a plain linear row-major 8-bit buffer with strideA. */
struct YAIK_SCustomDataSource {
    u8* planeR;
    u8* planeG;
    u8* planeB;
    u8* planeA;
    s32 strideR;
    s32 strideG;
    s32 strideB;
    s32 strideA;
};

typedef void (*imageBuilderFunc)(struct YAIK_SDecodedImage* userInfo,
                                 struct YAIK_SCustomDataSource* src);

struct YAIK_SDecodedImage {
    u16              width;                  /* filled by Pre            */
    u16              height;                 /* filled by Pre            */
    bool             hasAlpha;               /* filled by Pre            */

    imageBuilderFunc customImageOutput;      /* optional, set after Pre  */
    void*            userContextCustomImage; /* optional                 */

    struct YAIK_SMemAlloc userMemoryAllocator; /* optional (zero = default) */

    u8*              outputImage;            /* user buffer (RGB/RGBA)   */
    s32              outputImageStride;      /* bytes per row; 0 = tight */

    bool             hasAlpha1Bit;           /* filled by DecodeImage    */
    YAIK_INSTANCE    internalTag;            /* filled by Pre; opaque    */
};

/* Sticky error codes (first failure wins until read). Ordering matches the
 * reference enum so numeric values are interchangeable. */
enum YAIK_ERROR_CODE {
    YAIK_NO_ERROR = 0,
    YAIK_INVALID_LIBRARYCTX,
    YAIK_MALLOC_FAIL,
    YAIK_INVALID_CONTEXT_COUNT,
    YAIK_INIT_FAIL,
    YAIK_RELEASE_EMPTY_LIBRARY,
    YAIK_INVALID_STREAM,
    YAIK_INVALID_HEADER,
    YAIK_NO_EMPTYDECODE_SLOT,
    YAIK_DECIMG_INVALIDCTX,
    YAIK_DECIMG_DIFFSTREAM,
    YAIK_DECIMG_BUFFERNOTSET,
    YAIK_INVALID_CONTEXT_MEMALLOCATOR,
    YAIK_INVALID_DECOMPRESSION,
    YAIK_INVALID_LUT,

    YAIK_DECOMPRESSION_CREATE_FAIL,
    YAIK_INVALID_MIPMAP_LEVEL,
    YAIK_ALPHA_FORMAT_IMPOSSIBLE,
    YAIK_INVALID_ALPHA_FORMAT,
    YAIK_ALPHA_UNSUPPORTED_YET,
    YAIK_INVALID_TAG_ID,
    YAIK_INVALID_PLANE_ID,
};

/* Create a library handle with a pool of maxDecodeThreadContext decode
 * slots. libraryMemAllocator may be NULL (default malloc/free). */
YAIK_LIB YAIK_Init(u8 maxDecodeThreadContext,
                   struct YAIK_SMemAlloc* libraryMemAllocator);

/* Load a LUT bank file ('LUL0' 3D or 'LU20' 2D); expands all symmetry
 * patterns up front so decode does no per-tile transform work. */
void YAIK_AssignLUT(YAIK_LIB lib, u8* lutData, u32 lutDataLength);

/* Destroy the library, its LUTs and its instance pool. */
void YAIK_Release(YAIK_LIB lib);

/* Parse the stream header, reserve a decode slot, fill width/height/
 * hasAlpha. Must be paired with YAIK_DecodeImage (which always releases
 * the slot). Returns false on failure (see YAIK_GetErrorCode). */
bool YAIK_DecodeImagePre(YAIK_LIB lib, void* sourceStreamAligned,
                         u32 streamLength,
                         struct YAIK_SDecodedImage* getUserInfo);

/* Decode into context->outputImage (RGB or RGBA, outputImageStride bytes
 * per row) or hand the planes to customImageOutput. Releases the slot in
 * all cases. Returns false on failure. */
bool YAIK_DecodeImage(void* sourceStreamAligned, u32 streamLength,
                      struct YAIK_SDecodedImage* context);

/* Read-and-reset the sticky error code. */
enum YAIK_ERROR_CODE YAIK_GetErrorCode(void);

#ifdef __cplusplus
}
#endif

#endif /* YAIK_TPU_PUBLIC_HEADER */
