#!/bin/bash
# Build the reference duckdb shell (differential-test oracle) out-of-tree
# into the gitignored .refbuild/ directory. Nothing is copied from the
# reference; this is the same oracle strategy as SURVEY.md §4.
set -euo pipefail
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")/.." && pwd)
OUT=${OUT:-$HERE/.refbuild}
mkdir -p "$OUT"
cmake -G Ninja -S "$REF" -B "$OUT" -DCMAKE_BUILD_TYPE=Release \
  -DBUILD_EXTENSIONS='core_functions;tpch;json;parquet' \
  -DBUILD_UNITTESTS=OFF -DBUILD_SHELL=ON > "$OUT/cmake.log" 2>&1
ninja -C "$OUT" -j "$(nproc)" duckdb > "$OUT/build.log" 2>&1
echo "built $OUT/duckdb"
