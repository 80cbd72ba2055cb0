#!/usr/bin/env bash
# Build the native runtime (libttsrt.so) into build-csrc/.
set -euo pipefail
cd "$(dirname "$0")/.."
cmake -S csrc -B build-csrc -DCMAKE_BUILD_TYPE=Release >/dev/null
cmake --build build-csrc -j"$(nproc)"
echo "built: build-csrc/libttsrt.so"
