#!/usr/bin/env bash
# Build libduckdb_tpu.so — the C embedding surface (duckdb_tpu/capi/).
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
OUT="$ROOT/build/capi"
mkdir -p "$OUT"
PYINC="$(python3 -c 'import sysconfig; print(sysconfig.get_paths()["include"])')"
PYLIB="$(python3 -c 'import sysconfig; print(sysconfig.get_config_var("LIBDIR"))')"
PYVER="$(python3 -c 'import sysconfig; print(sysconfig.get_config_var("LDVERSION"))')"
g++ -O2 -fPIC -shared -std=c++17 \
    -I"$PYINC" -I"$ROOT/duckdb_tpu/capi" \
    "$ROOT/duckdb_tpu/capi/capi.cpp" \
    -L"$PYLIB" -lpython"$PYVER" \
    -o "$OUT/libduckdb_tpu.so"
echo "built $OUT/libduckdb_tpu.so"
