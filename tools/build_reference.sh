#!/usr/bin/env bash
# Build the C++ reference (KLab/YAIK @ /root/reference) on Linux, for golden
# fixture generation ONLY. Sources are compiled by absolute path from the
# read-only reference mount; nothing is copied into this repo.
#
# Products (under tools/refbuild/, gitignored):
#   libzstd134.so  - the reference's vendored zstd 1.3.4 as a shared lib
#                    (used by yaik_tpu's entropy layer for bit-exact encoding)
#   ref_encoder    - reference CLI: ref_encoder img.png -> img.png.yaik (+ LutFile.lut)
#   ref_decoder    - our fixture driver around the reference decoder lib:
#                    ref_decoder file.yaik LutFile.lut out.raw
set -euo pipefail
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=$HERE/refbuild
mkdir -p "$OUT/shim"

if [ ! -d "$REF" ]; then
  echo "reference not present at $REF; skipping reference build" >&2
  exit 2
fi

CXXFLAGS="-O2 -fno-strict-aliasing -w -fpermissive"
CFLAGS="-O2 -fno-strict-aliasing -w"

# ---- shim headers for MSVC-style backslash includes in ImageEncoder.cpp ----
printf '#include "%s/external/stb_image/stb_image.h"\n' "$REF" > "$OUT/shim/"'..\external\stb_image\stb_image.h'
printf '#include "%s/external/stb_image/stb_image_write.h"\n' "$REF" > "$OUT/shim/"'..\external\stb_image\stb_image_write.h'

# ---- vendored zstd 1.3.4 as a shared library ----
# This rule is the SINGLE build recipe for libzstd134.so; the entropy
# layer's import-time autobuild invokes `build_reference.sh zstd` rather
# than duplicating the command line (ADVICE r3). Compressed BYTES are
# unaffected by optimization flags (the algorithm is deterministic), only
# wall time - verified by the byte-exact golden tests. No -march=native:
# the .so is cached in the working tree and may be reloaded on a different
# CPU (container image reuse), where native-arch code could SIGILL.
if [ ! -f "$OUT/libzstd134.so" ]; then
  echo "building libzstd134.so (vendored zstd 1.3.4)"
  ZCFLAGS="-O3 -fno-strict-aliasing -w"
  ZSRC=$(ls "$REF"/external/zstd/*.c)
  ZTMP=$(mktemp "$OUT/.libzstd134.XXXXXX.so")
  gcc $ZCFLAGS -fPIC -shared -DZSTD_MULTITHREAD=0 -o "$ZTMP" $ZSRC -lpthread \
    && mv -f "$ZTMP" "$OUT/libzstd134.so" || { rm -f "$ZTMP"; exit 1; }
fi
if [ "${1:-}" = "zstd" ]; then
  echo "zstd-only build OK: $OUT/libzstd134.so"
  exit 0
fi

# ---- static zstd objects for linking the reference binaries ----
if [ ! -f "$OUT/zstd134.a" ]; then
  mkdir -p "$OUT/zobj"; (cd "$OUT/zobj"
    for f in "$REF"/external/zstd/*.c; do gcc $CFLAGS -c "$f" -o "$(basename "$f" .c).o"; done
    ar rcs "$OUT/zstd134.a" *.o)
fi

# ---- reference encoder (our driver main; see ref_encode_main.cpp) ----
if [ ! -f "$OUT/ref_encoder" ]; then
  echo "building ref_encoder"
  # -DDIRENT_H skips the vendored MSVC dirent.h (windows.h); -include pulls the
  # system dirent instead (used only by the LUT research path).
  g++ $CXXFLAGS -iquote "$OUT/shim" -I "$REF/encoder" -DDIRENT_H -include /usr/include/dirent.h -include cstring \
    "$HERE/ref_encode_main.cpp" "$REF"/encoder/EncoderContext.cpp \
    "$REF"/encoder/Image.cpp "$REF"/encoder/Plane.cpp \
    "$REF"/decoder/YAIK_GenericFunctions.cpp \
    "$OUT/zstd134.a" -lm -lpthread -o "$OUT/ref_encoder"
fi

# ---- disabled-pass driver: SingleColorOut (UCOL) goldens ----
if [ ! -f "$OUT/ref_encoder_ucol" ]; then
  echo "building ref_encoder_ucol"
  g++ $CXXFLAGS -iquote "$OUT/shim" -I "$REF/encoder" -DDIRENT_H -include /usr/include/dirent.h -include cstring \
    "$HERE/ref_encode_ucol_main.cpp" "$REF"/encoder/EncoderContext.cpp \
    "$REF"/encoder/Image.cpp "$REF"/encoder/Plane.cpp \
    "$REF"/decoder/YAIK_GenericFunctions.cpp \
    "$OUT/zstd134.a" -lm -lpthread -o "$OUT/ref_encoder_ucol"
fi

# ---- disabled-pass driver: Correlation2DSearch (2DTL) goldens ----
if [ ! -f "$OUT/ref_encoder_2d" ]; then
  echo "building ref_encoder_2d"
  g++ $CXXFLAGS -iquote "$OUT/shim" -I "$REF/encoder" -I "$REF/include" -DDIRENT_H -include /usr/include/dirent.h -include cstring \
    "$HERE/ref_encode_2d_main.cpp" "$REF"/encoder/EncoderContext.cpp \
    "$REF"/encoder/Image.cpp "$REF"/encoder/Plane.cpp \
    "$REF"/decoder/YAIK_GenericFunctions.cpp \
    "$OUT/zstd134.a" -lm -lpthread -o "$OUT/ref_encoder_2d"
fi

# ---- disabled-pass driver: DynamicTileEncode (PLNT) goldens ----
if [ ! -f "$OUT/ref_encoder_plnt" ]; then
  echo "building ref_encoder_plnt"
  g++ $CXXFLAGS -iquote "$OUT/shim" -I "$REF/encoder" -I "$REF/include" -DDIRENT_H -include /usr/include/dirent.h -include cstring \
    "$HERE/ref_encode_plnt_main.cpp" "$REF"/encoder/EncoderContext.cpp \
    "$REF"/encoder/Image.cpp "$REF"/encoder/Plane.cpp \
    "$REF"/decoder/YAIK_GenericFunctions.cpp \
    "$OUT/zstd134.a" -lm -lpthread -o "$OUT/ref_encoder_plnt"
fi

# ---- disabled-pass driver: plane-subset gradients (GTIL plane != 7) ----
if [ ! -f "$OUT/ref_encoder_gradpair" ]; then
  echo "building ref_encoder_gradpair"
  g++ $CXXFLAGS -iquote "$OUT/shim" -I "$REF/encoder" -I "$REF/include" -DDIRENT_H -include /usr/include/dirent.h -include cstring \
    "$HERE/ref_encode_gradpair_main.cpp" "$REF"/encoder/EncoderContext.cpp \
    "$REF"/encoder/Image.cpp "$REF"/encoder/Plane.cpp \
    "$REF"/decoder/YAIK_GenericFunctions.cpp \
    "$OUT/zstd134.a" -lm -lpthread -o "$OUT/ref_encoder_gradpair"
fi

# ---- dead-pass probe: SmoothMap (SMAP) aborts on heap corruption ----
if [ ! -f "$OUT/ref_encoder_smap" ]; then
  echo "building ref_encoder_smap"
  g++ $CXXFLAGS -iquote "$OUT/shim" -I "$REF/encoder" -DDIRENT_H -include /usr/include/dirent.h -include cstring \
    "$HERE/ref_encode_smap_main.cpp" "$REF"/encoder/EncoderContext.cpp \
    "$REF"/encoder/Image.cpp "$REF"/encoder/Plane.cpp \
    "$REF"/decoder/YAIK_GenericFunctions.cpp \
    "$OUT/zstd134.a" -lm -lpthread -o "$OUT/ref_encoder_smap"
fi

# ---- reference decoder + our raw-dump driver ----
if [ ! -f "$OUT/ref_decoder" ]; then
  echo "building ref_decoder"
  # YAIK_DEVEL matches the reference vcxproj config; shim Windows.h supplies
  # a no-op _CrtCheckMemory on Linux.
  printf 'static inline int _CrtCheckMemory(void){return 1;}\n' > "$OUT/shim/Windows.h"
  g++ $CXXFLAGS -I "$REF/include" -I "$OUT/shim" -DYAIK_DEVEL -DZSTD_STATIC_LINKING_ONLY \
    "$HERE/ref_decode_main.cpp" \
    "$REF"/decoder/YAIK_API.cpp "$REF"/decoder/YAIK_Gradient.cpp \
    "$REF"/decoder/YAIK_3DTile.cpp "$REF"/decoder/YAIK_Alpha.cpp \
    "$REF"/decoder/YAIK_Mipmap.cpp "$REF"/decoder/YAIK_GenericFunctions.cpp \
    "$REF"/decoder/YAIK_DefaultCallback.cpp \
    "$OUT/zstd134.a" -lm -lpthread -o "$OUT/ref_decoder"
fi
echo "reference build OK: $OUT"
