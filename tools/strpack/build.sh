#!/bin/bash
# Build the native string packer shared library.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${OUT:-$HERE/../../build}
mkdir -p "$OUT"
g++ -O3 -shared -fPIC -pthread "$HERE/strpack.cpp" -o "$OUT/libstrpack.so"
echo "built $OUT/libstrpack.so"
