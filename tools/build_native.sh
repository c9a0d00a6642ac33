#!/usr/bin/env bash
# Build the native host runtime: yaik_tpu/native/libyaik_host.so
set -euo pipefail
HERE=$(cd "$(dirname "$0")/.." && pwd)
g++ -O2 -fPIC -shared -o "$HERE/yaik_tpu/native/libyaik_host.so" \
    "$HERE/yaik_tpu/native/yaik_host.cpp"
echo "built $HERE/yaik_tpu/native/libyaik_host.so"
