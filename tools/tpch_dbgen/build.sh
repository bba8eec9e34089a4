#!/bin/bash
# Build the standalone TPC-H generator against the read-only vendored TPC
# dbgen core (no files copied; objects land in build/).
set -euo pipefail
REF=${REF:-/root/reference/extension/tpch/dbgen}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${OUT:-$HERE/../../build/tpch_dbgen}
mkdir -p "$OUT"
SRCS="dbgen_gunk.cpp bm_utils.cpp build.cpp permute.cpp rnd.cpp rng64.cpp speed_seed.cpp text.cpp"
OBJS=""
for s in $SRCS; do
  o="$OUT/${s%.cpp}.o"
  if [ ! -f "$o" ] || [ "$REF/$s" -nt "$o" ]; then
    g++ -O2 -w -I "$REF/include" -c "$REF/$s" -o "$o"
  fi
  OBJS="$OBJS $o"
done
g++ -O2 -I "$REF/include" "$HERE/dbgen_main.cpp" $OBJS -o "$OUT/dbgen_tbl"
echo "built $OUT/dbgen_tbl"
