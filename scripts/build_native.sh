#!/bin/bash
# Build the native C++ streaming runtime (library + wav CLI).
set -euo pipefail
cd "$(dirname "$0")/../native"
mkdir -p build && cd build
cmake -DCMAKE_BUILD_TYPE=Release .. >/dev/null
make -j"$(nproc)"
echo "built: $(pwd)/libgtcrn_micro.so and $(pwd)/gtcrn_stream"
