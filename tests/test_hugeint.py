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


def test_sum_bigint_promotes_to_hugeint():
    """sum(BIGINT) must not wrap around int64 (reference:
    core_functions/aggregate/distributive/sum.cpp promotes to HUGEINT)."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE big(x BIGINT)")
    con.sql("INSERT INTO big VALUES (9223372036854775807),"
            "(9223372036854775807),(5)")
    assert con.sql("SELECT sum(x) FROM big").rows() == \
        [(18446744073709551619,)]
    assert con.sql(
        "SELECT sum(x) FROM (VALUES (9223372036854775807),"
        "(9223372036854775807)) t(x)").rows() == [(18446744073709551614,)]
    # negatives
    assert con.sql(
        "SELECT sum(x) FROM (VALUES (-9223372036854775807),"
        "(-9223372036854775807),(-5)) t(x)").rows() == \
        [(-18446744073709551619,)]


def test_sum_bigint_grouped_and_sorted_paths():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t2 (g BIGINT, x BIGINT)")
    con.sql("INSERT INTO t2 SELECT range % 3, 9223372036854775807 - range "
            "FROM range(5000)")
    exp = sum(9223372036854775807 - i for i in range(5000))
    assert con.sql("SELECT sum(x) FROM t2").rows()[0][0] == exp
    per_g = {g: sum(9223372036854775807 - i for i in range(5000)
                    if i % 3 == g) for g in range(3)}
    got = con.sql("SELECT g, sum(x) FROM t2 GROUP BY g ORDER BY g").rows()
    assert got == [(g, per_g[g]) for g in range(3)]
    # sparse keys exercise the sort-group strategy
    con.sql("CREATE TABLE t3 (g BIGINT, x BIGINT)")
    con.sql("INSERT INTO t3 SELECT range * 1000001, 9223372036854775807 "
            "FROM range(100)")
    got = con.sql("SELECT g, sum(x) FROM t3 GROUP BY g ORDER BY g "
                  "LIMIT 2").rows()
    assert got == [(0, 9223372036854775807), (1000001, 9223372036854775807)]


def test_sum_small_ints_still_exact():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    r = con.sql("SELECT sum(i) FROM range(1000) t(i)").rows()
    assert r == [(499500,)]


def test_sum_bigint_property_random():
    """Property sweep: random int64 mixes vs python exact arithmetic."""
    import random

    import duckdb_tpu

    rng = random.Random(42)
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE p (g INT, x BIGINT)")
    vals = [(rng.randrange(3),
             rng.randrange(-(2**63), 2**63)) for _ in range(500)]
    con.sql("INSERT INTO p VALUES " +
            ",".join(f"({g},{x})" for g, x in vals))
    exp = {g: sum(x for gg, x in vals if gg == g) for g in range(3)}
    got = con.sql("SELECT g, sum(x) FROM p GROUP BY g ORDER BY g").rows()
    assert got == [(g, exp[g]) for g in sorted(exp)]
