"""Holistic / positional aggregates — differential vs the reference."""

import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

SETUP = ("CREATE TABLE t (g VARCHAR, x INTEGER, s VARCHAR); "
         "INSERT INTO t VALUES ('a',3,'u'),('a',1,'v'),('a',1,'w'),"
         "('a',7,'p'),('b',10,'q'),('b',NULL,'r'),('b',20,'s');")

QUERIES = [
    "SELECT g, first(x ORDER BY x), last(s ORDER BY s) FROM t GROUP BY g ORDER BY g",
    "SELECT g, arg_min(s, x), arg_max(s, x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, median(x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, quantile_cont(x, 0.25) FROM t GROUP BY g ORDER BY g",
    "SELECT g, quantile_disc(x, 0.5) FROM t GROUP BY g ORDER BY g",
    "SELECT g, mode(x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, product(x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, bit_and(x), bit_or(x), bit_xor(x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, string_agg(s, '+' ORDER BY s) FROM t GROUP BY g ORDER BY g",
    "SELECT g, sum(DISTINCT x), count(DISTINCT x) FROM t GROUP BY g ORDER BY g",
    "SELECT median(x) FROM t",
    "SELECT g, any_value(x ORDER BY x) FROM t GROUP BY g ORDER BY g",
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
    return ["|".join("NULL" if v is None else
                     ("true" if v is True else "false" if v is False
                      else str(v)) for v in r) for r in rows]


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
@pytest.mark.parametrize("q", QUERIES)
def test_aggregate_differential(con, q):
    got = _norm(con.sql(q).rows())
    ref_r = subprocess.run([REF_BIN, "-list", "-noheader", "-c", SETUP + q],
                           capture_output=True, text=True)
    assert ref_r.returncode == 0, ref_r.stderr
    ref = ref_r.stdout.splitlines()
    assert got == ref, f"\ngot: {got}\nref: {ref}"


def test_within_group_ordered_set():
    """percentile_cont/disc and mode() WITHIN GROUP (ORDER BY e) rewrite to
    the regular aggregate forms (reference-verified)."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE wg (v INT)")
    con.sql("INSERT INTO wg VALUES (1),(2),(3),(4)")
    assert con.sql("SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY v) "
                   "FROM wg").rows() == [(1.75,)]
    assert con.sql("SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY v) "
                   "FROM wg").rows() == [(2,)]
    assert con.sql("SELECT mode() WITHIN GROUP (ORDER BY v) FROM wg"
                   ).rows() == [(1,)]
