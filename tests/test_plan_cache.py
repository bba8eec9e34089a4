"""SELECT plan caching: reuse across identical queries, invalidation on
DML/DDL/SET, nondeterministic plans stay uncached.

Reference analog: prepared-statement plan reuse (the reference re-plans
each unprepared query; this engine caches by SQL text because jitted
XLA programs hang off plan nodes and recompiling them dominates)."""

import pytest

import duckdb_tpu


@pytest.fixture
def con():
    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE t (a INT, b VARCHAR)")
    c.sql("INSERT INTO t VALUES (1, 'x'), (2, 'y')")
    return c


def test_repeat_query_reuses_plan(con):
    q = "SELECT sum(a) FROM t WHERE b <> 'z'"
    assert con.sql(q).rows() == [(3,)]
    assert q in getattr(con, "_plan_cache", {})
    plan1 = con._plan_cache[q]
    assert con.sql(q).rows() == [(3,)]
    assert con._plan_cache[q] is plan1


def test_dml_invalidates(con):
    q = "SELECT count(*) FROM t"
    assert con.sql(q).rows() == [(2,)]
    con.sql("INSERT INTO t VALUES (3, 'z')")
    assert con.sql(q).rows() == [(3,)]


def test_ddl_invalidates(con):
    q = "SELECT * FROM t ORDER BY a"
    assert con.sql(q).rows() == [(1, "x"), (2, "y")]
    con.sql("ALTER TABLE t ADD COLUMN c INT")
    assert con.sql(q).rows() == [(1, "x", None), (2, "y", None)]


def test_set_invalidates(con):
    q = "SELECT a FROM t ORDER BY a LIMIT 1"
    assert con.sql(q).rows() == [(1,)]
    con.sql("SET threads = 1")
    assert con.sql(q).rows() == [(1,)]


def test_nondeterministic_not_cached(con):
    q = "SELECT a + CAST(floor(random() * 0) AS INT) FROM t ORDER BY a"
    con.sql(q)
    assert q not in con._plan_cache


def test_multi_statement_text_not_cached(con):
    con.sql("SELECT 1; SELECT 2")
    assert all(";" not in k for k in con._plan_cache)
