"""Locate the reference duckdb shell binary for differential tests.

Resolution order: $DUCKDB_REF_BIN, the in-repo gitignored build
(.refbuild/duckdb, built by tools/build_reference.sh), then the legacy
out-of-repo /root/build-duckdb/duckdb location.
"""

import os

_CANDIDATES = [
    os.environ.get("DUCKDB_REF_BIN", ""),
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".refbuild", "duckdb"),
    "/root/build-duckdb/duckdb",
]


def find_ref_bin() -> str:
    """Path to the reference binary, or the legacy default if none exist
    (callers gate with os.path.exists)."""
    for c in _CANDIDATES:
        if c and os.path.exists(c):
            return c
    return "/root/build-duckdb/duckdb"


REF_BIN = find_ref_bin()
