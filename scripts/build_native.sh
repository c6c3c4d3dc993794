#!/usr/bin/env bash
# Build the native components (C extensions loaded via ctypes).
set -euo pipefail
cd "$(dirname "$0")/.."
gcc -O3 -shared -fPIC -o dogs_tpu/native/libcolmap_fast.so dogs_tpu/native/colmap_fast.c
echo "built dogs_tpu/native/libcolmap_fast.so"
