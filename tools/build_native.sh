#!/usr/bin/env bash
# Build the native host runtime:
#   yaik_tpu/native/libyaik_host.so  - palette codec + planner replay (ctypes)
#   yaik_tpu/native/libyaik_tpu.so   - C-ABI host decoder library
#                                      (public header: native/include/yaik_tpu.h)
set -euo pipefail
HERE=$(cd "$(dirname "$0")/.." && pwd)
g++ -O3 -march=native -fPIC -shared -o "$HERE/yaik_tpu/native/libyaik_host.so" \
    "$HERE/yaik_tpu/native/yaik_host.cpp"
echo "built $HERE/yaik_tpu/native/libyaik_host.so"
g++ -O3 -march=native -fPIC -shared -Wall -Wextra -Wno-unused-parameter \
    -o "$HERE/yaik_tpu/native/libyaik_tpu.so" \
    "$HERE/yaik_tpu/native/yaik_capi.cpp" \
    "$HERE/yaik_tpu/native/yaik_host.cpp" \
    -lzstd
echo "built $HERE/yaik_tpu/native/libyaik_tpu.so"
