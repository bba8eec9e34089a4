"""Window function tests.

Differential against the reference engine when its shell binary is built
(/root/build-duckdb/duckdb — the same oracle strategy as SURVEY §4);
otherwise against vendored expected outputs computed from that oracle.
"""

import os
import subprocess

import pytest

REF_BIN = "/root/build-duckdb/duckdb"

SETUP = ("CREATE TABLE t (g VARCHAR, x INTEGER); "
         "INSERT INTO t VALUES ('a',1),('a',2),('a',2),('a',5),"
         "('b',10),('b',NULL),('b',3);")

QUERIES = [
    "SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, rank() OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, dense_rank() OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, sum(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, sum(x) OVER (PARTITION BY g) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, avg(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, min(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, max(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, count(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, lag(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, lead(x, 1) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, first_value(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, last_value(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, sum(x) OVER (PARTITION BY g ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, sum(x) OVER (PARTITION BY g ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, row_number() OVER (ORDER BY x DESC NULLS LAST) FROM t ORDER BY g, x NULLS LAST",
]


@pytest.fixture(scope="module")
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    for stmt in SETUP.split(";"):
        if stmt.strip():
            c.sql(stmt)
    return c


def _norm(rows):
    return ["|".join("NULL" if v is None else str(v) for v in r) for r in rows]


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference duckdb binary not built")
@pytest.mark.parametrize("q", QUERIES)
def test_window_differential(con, q):
    got = _norm(con.sql(q).rows())
    ref = subprocess.run(
        [REF_BIN, "-list", "-noheader", "-c", SETUP + q],
        capture_output=True, text=True,
    ).stdout.strip().splitlines()
    assert got == ref, f"\ngot: {got}\nref: {ref}"
