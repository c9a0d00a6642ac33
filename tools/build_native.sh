#!/usr/bin/env bash
# Build the native host runtime:
#   yaik_tpu/native/libyaik_host.so  - palette codec + planner replay (ctypes)
#   yaik_tpu/native/libyaik_tpu.so   - C-ABI host decoder library
#                                      (public header: native/include/yaik_tpu.h)
set -euo pipefail
HERE=$(cd "$(dirname "$0")/.." && pwd)
# Link to a temp file and rename into place: rename is atomic on the same
# filesystem, so a concurrent import (or a killed build) never observes a
# half-written .so (ADVICE r3).
TMP1=$(mktemp "$HERE/yaik_tpu/native/.libyaik_host.XXXXXX.so")
trap 'rm -f "$TMP1" "${TMP2:-}"' EXIT
g++ -O3 -march=native -fPIC -shared -o "$TMP1" \
    "$HERE/yaik_tpu/native/yaik_host.cpp"
mv -f "$TMP1" "$HERE/yaik_tpu/native/libyaik_host.so"
echo "built $HERE/yaik_tpu/native/libyaik_host.so"
TMP2=$(mktemp "$HERE/yaik_tpu/native/.libyaik_tpu.XXXXXX.so")
g++ -O3 -march=native -fPIC -shared -Wall -Wextra -Wno-unused-parameter \
    -o "$TMP2" \
    "$HERE/yaik_tpu/native/yaik_capi.cpp" \
    "$HERE/yaik_tpu/native/yaik_host.cpp" \
    -lzstd
mv -f "$TMP2" "$HERE/yaik_tpu/native/libyaik_tpu.so"
echo "built $HERE/yaik_tpu/native/libyaik_tpu.so"
