"""Out-of-core execution: partition-loop over row chunks when the scan
working set exceeds `memory_limit`.

Mirrors the reference's spilling tier (external hash join
/root/reference/src/execution/operator/join/physical_hash_join.cpp:345,1084
and memory arbitration
/root/reference/src/storage/temporary_memory_manager.cpp:28): the TPU
equivalent keeps host DRAM as the spill tier and streams the fact table
through the compiled pipeline in row chunks (execution/chunked.py).

Every test asserts bit-identity between the in-memory and chunked runs —
the analog of the reference's force_external config rerun
(/root/reference/test/configs/force_external.json).
"""

import os
import subprocess

import pytest

import duckdb_tpu

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "sf0.01")


def _fresh(limit=None):
    c = duckdb_tpu.connect()
    if limit:
        c.sql(f"SET memory_limit = '{limit}'")
    return c


def _ooc_logs(con):
    return [m for (m,) in con.sql(
        "SELECT message FROM duckdb_logs() WHERE type='out_of_core'"
    ).fetchall()]


@pytest.fixture
def con():
    c = duckdb_tpu.connect()
    yield c
    c.sql("SET memory_limit = '0'")


def _check(con, queries, limit="1MB", expect_chunked=True):
    refs = [con.sql(q).fetchall() for q in queries]
    con.sql(f"SET memory_limit = '{limit}'")
    n0 = len(_ooc_logs(con))
    try:
        for q, ref in zip(queries, refs):
            got = con.sql(q).fetchall()
            assert got == ref, f"chunked result differs for {q}"
        if expect_chunked:
            assert len(_ooc_logs(con)) > n0, "no query took the chunked path"
    finally:
        con.sql("SET memory_limit = '0'")


def test_chunked_aggregates(con):
    con.sql("CREATE TABLE t AS SELECT range AS i, range % 7 AS g,"
            " range * 0.5 AS x FROM range(100000)")
    _check(con, [
        "SELECT g, sum(i), count(*), avg(x), min(i), max(x) FROM t"
        " GROUP BY g ORDER BY g",
        "SELECT sum(x), count(*) FROM t",
        "SELECT count(*) FROM t WHERE g = 3",
        "SELECT g, avg(i) FROM t GROUP BY g HAVING avg(i) > 24999 ORDER BY g",
    ])


def test_chunked_pure_select(con):
    con.sql("CREATE TABLE t AS SELECT range AS i, range % 7 AS g,"
            " range * 0.5 AS x FROM range(100000)")
    _check(con, [
        "SELECT i, x FROM t WHERE i % 1000 = 3 ORDER BY i LIMIT 20",
        # ORDER BY an unprojected source column (pass-through plane)
        "SELECT i FROM t WHERE i < 50 ORDER BY x DESC LIMIT 5",
    ])


def test_chunked_probe_side_join(con):
    con.sql("CREATE TABLE fact AS SELECT range AS id, range % 100 AS k,"
            " range * 1.5 AS v FROM range(200000)")
    con.sql("CREATE TABLE dim AS SELECT range AS k, range * 7 AS nm"
            " FROM range(100)")
    _check(con, [
        "SELECT d.nm, sum(f.v), count(*) FROM fact f JOIN dim d"
        " ON f.k = d.k WHERE f.id % 3 = 0 GROUP BY d.nm"
        " ORDER BY d.nm LIMIT 10",
        "SELECT f.id, d.nm FROM fact f JOIN dim d ON f.k = d.k"
        " WHERE f.id % 20000 = 7 ORDER BY f.id",
    ], limit="2MB")


def test_unchunkable_falls_back(con):
    """Holistic aggregates (median) have no distributive merge: the engine
    must log the fallback and still answer correctly in-memory."""
    con.sql("CREATE TABLE t AS SELECT range AS i, range % 5 AS g"
            " FROM range(100000)")
    ref = con.sql("SELECT g, median(i) FROM t GROUP BY g ORDER BY g").fetchall()
    con.sql("SET memory_limit = '1MB'")
    got = con.sql("SELECT g, median(i) FROM t GROUP BY g ORDER BY g").fetchall()
    con.sql("SET memory_limit = '0'")
    assert got == ref
    assert any("not merge-decomposable" in m for m in _ooc_logs(con))


def test_chunked_varchar_group_keys(con):
    """Per-chunk dictionaries are re-encoded at merge (chunk dict codes are
    not comparable across chunks)."""
    con.sql("CREATE TABLE t (s VARCHAR, v BIGINT)")
    con.sql("INSERT INTO t SELECT CASE WHEN range % 3 = 0 THEN 'aa'"
            " WHEN range % 3 = 1 THEN 'bb' ELSE 'cc' END, range"
            " FROM range(60000)")
    _check(con, [
        "SELECT s, sum(v), count(*) FROM t GROUP BY s ORDER BY s",
        "SELECT s FROM t WHERE v % 9999 = 5 ORDER BY v",
    ], limit="500KB")


@pytest.fixture(scope="module")
def tpch():
    if not os.path.isdir(DATA):
        root = os.path.join(os.path.dirname(__file__), "..")
        subprocess.run(["bash", "tools/tpch_dbgen/build.sh"], cwd=root,
                       check=True)
        subprocess.run(["./build/tpch_dbgen/dbgen_tbl", "0.01", "data/sf0.01"],
                       cwd=root, check=True)
    c = duckdb_tpu.connect()
    c.load_tpch(DATA)
    return c


def _tpch_q(n):
    path = f"/root/reference/extension/tpch/dbgen/queries/q{n:02d}.sql"
    with open(path) as f:
        return f.read()


@pytest.mark.parametrize("qn", [1, 3, 6])
def test_tpch_under_memory_pressure(tpch, qn):
    """TPC-H under a memory_limit smaller than lineitem: bit-identical to the
    in-memory run (which is itself oracle-checked in test_tpch.py)."""
    q = _tpch_q(qn)
    ref = tpch.sql(q).fetchall()
    tpch.sql("SET memory_limit = '2MB'")
    try:
        got = tpch.sql(q).fetchall()
    finally:
        tpch.sql("SET memory_limit = '0'")
    assert got == ref


def test_chunked_group_bounds_not_baked(tpch):
    """Group-key bounds are baked into traced fused programs as Python
    ints; per-chunk table views have different stats, so the trace cache
    must key on them. Regression: chunk 2 reused chunk 1's program and
    clamped its keys into chunk 1's domain (half the groups collapsed,
    sums merged across keys)."""
    q = ("SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)), "
         "o_orderdate FROM lineitem, orders WHERE l_orderkey = o_orderkey "
         "GROUP BY l_orderkey, o_orderdate")
    ref = sorted(tpch.sql(q).fetchall())
    for lim in ("3MB", "1MB", "400KB"):
        tpch.sql(f"SET memory_limit = '{lim}'")
        try:
            got = sorted(tpch.sql(q).fetchall())
        finally:
            tpch.sql("SET memory_limit = '0'")
        assert got == ref, lim


def test_tpch_q3_multiple_limits(tpch):
    q = _tpch_q(3)
    ref = tpch.sql(q).fetchall()
    for lim in ("400KB", "3MB", "6MB"):
        tpch.sql(f"SET memory_limit = '{lim}'")
        try:
            got = tpch.sql(q).fetchall()
        finally:
            tpch.sql("SET memory_limit = '0'")
        assert got == ref, lim
