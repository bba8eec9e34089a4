"""Exact >int64 DECIMAL sums (int128 via hi/lo planes)."""

import decimal
import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501


def test_wide_sum_exact():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (g INT, v DECIMAL(18,2))")
    con.sql("INSERT INTO t SELECT range % 3, 9999999999999999.99 "
            "FROM range(2000)")
    rows = con.sql("SELECT g, sum(v) FROM t GROUP BY g ORDER BY g").rows()
    # python oracle (exact big-int arithmetic)
    per = 999999999999999999
    for g, s in rows:
        n = 667 if g < 2 else 666
        assert s == decimal.Decimal(per * n).scaleb(-2)
        assert int(s.scaleb(2)) > 2**63 - 1  # genuinely beyond int64


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
def test_wide_sum_differential():
    import duckdb_tpu

    setup = ("CREATE TABLE t (g INT, v DECIMAL(18,2)); "
             "INSERT INTO t SELECT range % 3, 9999999999999999.99 - range "
             "FROM range(2000);")
    q = "SELECT g, sum(v) FROM t GROUP BY g ORDER BY 2 DESC, g"
    con = duckdb_tpu.connect()
    for stmt in setup.split(";"):
        if stmt.strip():
            con.sql(stmt)
    got = [f"{r[0]}|{r[1]}" for r in con.sql(q).rows()]
    ref = subprocess.run([REF_BIN, "-list", "-noheader", "-c", setup + q],
                         capture_output=True, text=True).stdout.splitlines()
    assert got == ref


def test_narrow_sums_unaffected():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (v DECIMAL(15,2))")
    con.sql("INSERT INTO t VALUES (1.50), (2.25), (NULL)")
    assert con.sql("SELECT sum(v) FROM t").rows() == \
        [(decimal.Decimal("3.75"),)]
