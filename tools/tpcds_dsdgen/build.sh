#!/bin/bash
# Build the standalone TPC-DS generator against the read-only vendored TPC
# dsdgen core (no files copied; objects land in build/).
set -euo pipefail
REF=${REF:-/root/reference/extension/tpcds/dsdgen}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${OUT:-$HERE/../../build/tpcds_dsdgen}
mkdir -p "$OUT"
OBJS=""
for src in "$REF"/dsdgen-c/*.cpp; do
  base=$(basename "$src" .cpp)
  o="$OUT/$base.o"
  if [ ! -f "$o" ] || [ "$src" -nt "$o" ]; then
    g++ -O2 -w -I "$REF/include" -I "$REF/include/dsdgen-c" -c "$src" -o "$o"
  fi
  OBJS="$OBJS $o"
done
g++ -O2 -w -I "$REF/include" -I "$REF/include/dsdgen-c" \
    "$HERE/dsdgen_main.cpp" $OBJS -o "$OUT/dsdgen_tbl"
echo "built $OUT/dsdgen_tbl"
