"""FULL OUTER and USING joins — differential vs the reference binary."""

import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

SETUP = ("CREATE TABLE a (x INT, s VARCHAR); "
         "CREATE TABLE b (x INT, t VARCHAR); "
         "INSERT INTO a VALUES (1,'a1'),(2,'a2'),(3,'a3'); "
         "INSERT INTO b VALUES (2,'b2'),(3,'b3'),(4,'b4');")


@pytest.fixture()
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    for stmt in SETUP.split(";"):
        if stmt.strip():
            c.sql(stmt)
    return c


def _norm(rows):
    return ["|".join("NULL" if v is None else str(v) for v in r) for r in rows]


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
def test_full_outer_join(con):
    q = ("SELECT a.x, s, b.x, t FROM a FULL JOIN b ON a.x = b.x "
         "ORDER BY a.x NULLS LAST, b.x NULLS LAST")
    got = _norm(con.sql(q).rows())
    ref = subprocess.run([REF_BIN, "-list", "-noheader", "-c", SETUP + q],
                         capture_output=True, text=True).stdout.splitlines()
    assert got == ref


def test_using_join(con):
    rows = con.sql(
        "SELECT a.x, s, t FROM a JOIN b USING (x) ORDER BY a.x").rows()
    assert rows == [(2, "a2", "b2"), (3, "a3", "b3")]


def test_full_join_all_matched(con):
    con.sql("DELETE FROM a WHERE x = 1")
    con.sql("DELETE FROM b WHERE x = 4")
    rows = con.sql("SELECT count(*) FROM a FULL JOIN b ON a.x = b.x").rows()
    assert rows == [(2,)]


def test_join_fusion_matches_general_path():
    """Fused probe pipeline (default on) must agree with the general join
    path on a Q5-shaped star query — and must actually engage."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE dim (k INT, name VARCHAR)")
    con.sql("INSERT INTO dim VALUES (1,'a'),(2,'b'),(3,'c')")
    con.sql("CREATE TABLE dim2 (j INT, region VARCHAR)")
    con.sql("INSERT INTO dim2 VALUES (10,'x'),(20,'y')")
    con.sql("CREATE TABLE fact (k INT, j INT, v INT)")
    con.sql("INSERT INTO fact SELECT 1 + range % 3, "
            "CASE WHEN range % 2 = 0 THEN 10 ELSE 20 END, range "
            "FROM range(1000)")
    q = ("SELECT name, region, sum(v), count(*) FROM fact, dim, dim2 "
         "WHERE fact.k = dim.k AND fact.j = dim2.j AND v < 900 "
         "GROUP BY name, region ORDER BY 1, 2")
    import duckdb_tpu.execution.fused_agg as FA

    called = []
    orig = FA._prep_join_step
    FA._prep_join_step = (
        lambda ex, j, pfx, aux: called.append(1) or orig(ex, j, pfx, aux))
    try:
        fused = con.sql(q).rows()
    finally:
        FA._prep_join_step = orig
    assert called, "join fusion did not engage"
    # general path: force the fused builder off
    orig2 = FA.build_fused_agg
    FA.build_fused_agg = lambda ex, node: None
    try:
        con2 = duckdb_tpu.connect()
        con2.sql("CREATE TABLE dim (k INT, name VARCHAR)")
        con2.sql("INSERT INTO dim VALUES (1,'a'),(2,'b'),(3,'c')")
        con2.sql("CREATE TABLE dim2 (j INT, region VARCHAR)")
        con2.sql("INSERT INTO dim2 VALUES (10,'x'),(20,'y')")
        con2.sql("CREATE TABLE fact (k INT, j INT, v INT)")
        con2.sql("INSERT INTO fact SELECT 1 + range % 3, "
                 "CASE WHEN range % 2 = 0 THEN 10 ELSE 20 END, range "
                 "FROM range(1000)")
        base = con2.sql(q).rows()
    finally:
        FA.build_fused_agg = orig2
    assert fused == base


def test_positional_join():
    """Row-by-row zip; shorter side pads with NULLs (reference:
    physical_positional_join.cpp)."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE a (x INT)")
    con.sql("INSERT INTO a VALUES (1),(2),(3)")
    con.sql("CREATE TABLE b (y VARCHAR)")
    con.sql("INSERT INTO b VALUES ('p'),('q')")
    assert con.sql("SELECT * FROM a POSITIONAL JOIN b").rows() == [
        (1, "p"), (2, "q"), (3, None)]


def test_from_first_and_values():
    """FROM-first syntax and top-level VALUES (reference PEG grammar)."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (g INT, v INT)")
    con.sql("INSERT INTO t VALUES (1,10),(1,20),(2,5)")
    assert con.sql("FROM t").rows() == [(1, 10), (1, 20), (2, 5)]
    assert con.sql("FROM t SELECT g ORDER BY g").rows() == [(1,), (1,), (2,)]
    assert con.sql("FROM t WHERE v > 6 SELECT count(*)").rows() == [(2,)]
    assert con.sql("FROM t GROUP BY g SELECT g, sum(v) ORDER BY g"
                   ).rows() == [(1, 30), (2, 5)]
    assert con.sql("VALUES (1,2), (3,4)").rows() == [(1, 2), (3, 4)]
