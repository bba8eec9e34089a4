"""Statistical aggregates (corr/covar/regr_*/moments) — differential vs the
reference binary. Float results compare with 1e-9 relative tolerance (the
reference accumulates via Welford updates; we use moment sums — equal
algebra, different rounding order)."""

import math
import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

SETUP = ("CREATE TABLE t (g VARCHAR, x DOUBLE, y DOUBLE); "
         "INSERT INTO t VALUES ('a',1.0,2.0),('a',2.0,4.1),('a',3.0,5.9),"
         "('a',3.5,8.0),('b',1.0,1.0),('b',NULL,3.0),('b',4.0,NULL),"
         "('b',2.5,2.5),('c',7.0,2.0),('d',NULL,NULL);")

QUERIES = [
    "SELECT g, corr(y,x), covar_pop(y,x), covar_samp(y,x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, regr_slope(y,x), regr_intercept(y,x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, regr_r2(y,x), regr_count(y,x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, regr_avgx(y,x), regr_avgy(y,x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, regr_sxx(y,x), regr_syy(y,x), regr_sxy(y,x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, skewness(x), kurtosis(x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, kurtosis_pop(x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, sem(x), mad(x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, entropy(x), count_if(x > 1.5) FROM t GROUP BY g ORDER BY g",
    "SELECT corr(y,x), skewness(x), entropy(g) FROM t",
    "SELECT g, fsum(x), favg(x), sumkahan(x), kahan_sum(x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, arbitrary(x ORDER BY x), max_by(y, x), min_by(y, x) FROM t GROUP BY g ORDER BY g",
    "SELECT g, argmax(y, x), argmin(y, x) FROM t GROUP BY g ORDER BY g",
    "SELECT count_if(x > 2) FROM t",
    "SELECT g, reservoir_quantile(x, 0.5) FROM t GROUP BY g ORDER BY g",
]


@pytest.fixture(scope="module")
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    for stmt in SETUP.split(";"):
        if stmt.strip():
            c.sql(stmt)
    return c


def _close(a, b):
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return False
    if math.isnan(fa) and math.isnan(fb):
        return True
    return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
@pytest.mark.parametrize("q", QUERIES)
def test_stat_agg_differential(con, q):
    got = con.sql(q).rows()
    ref_r = subprocess.run([REF_BIN, "-list", "-noheader", "-c", SETUP + q],
                           capture_output=True, text=True)
    assert ref_r.returncode == 0, ref_r.stderr
    ref = [l.split("|") for l in ref_r.stdout.splitlines()]
    assert len(got) == len(ref), f"\ngot: {got}\nref: {ref}"
    for grow, rrow in zip(got, ref):
        assert len(grow) == len(rrow)
        for gv, rv in zip(grow, rrow):
            gs = "NULL" if gv is None else str(gv)
            assert _close(gs, rv) or gs == rv, \
                f"\nquery: {q}\ngot: {got}\nref: {ref}"


def test_approx_count_distinct_small(con):
    r = con.sql("SELECT approx_count_distinct(x) "
                "FROM (VALUES (1),(2),(2),(NULL)) t(x)").rows()
    assert r == [(2,)]


def test_approx_count_distinct_grouped(con):
    r = con.sql("SELECT g, approx_count_distinct(x) FROM (VALUES "
                "(1,'a'),(1,'b'),(1,'b'),(2,'c')) t(g,x) "
                "GROUP BY g ORDER BY g").rows()
    assert r == [(1, 2), (2, 1)]


def test_approx_count_distinct_error_bound(con):
    # HLL with 2048 registers: relative error ~2.3%; allow 5%.
    con.sql("CREATE TABLE acd AS SELECT (range * 7919) % 50000 AS v "
            "FROM range(200000)")
    (n,) = con.sql("SELECT approx_count_distinct(v) FROM acd").rows()[0]
    assert abs(n - 50000) < 2500
    con.sql("DROP TABLE acd")


def test_approx_count_distinct_many_groups_exact_fallback(con):
    # >2048 groups routes to the exact sort-dedup path.
    con.sql("CREATE TABLE acd2 AS SELECT range % 5000 AS g, range % 7 AS v "
            "FROM range(40000)")
    rows = con.sql("SELECT g, approx_count_distinct(v) FROM acd2 "
                   "GROUP BY g ORDER BY g LIMIT 3").rows()
    assert rows == [(0, 7), (1, 7), (2, 7)]
    con.sql("DROP TABLE acd2")
