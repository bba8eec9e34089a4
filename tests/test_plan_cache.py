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


def test_probe_cache_reuse_and_invalidation():
    """The fused join's probe mapping caches across runs keyed by both
    table versions; DML on either side invalidates it."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE dim (k BIGINT PRIMARY KEY, v BIGINT)")
    con.sql("INSERT INTO dim SELECT range, range * 10 FROM range(1000)")
    con.sql("CREATE TABLE fact (fk BIGINT, x BIGINT)")
    con.sql("INSERT INTO fact SELECT range % 1000, range FROM range(100000)")
    q = ("SELECT sum(v + x) FROM fact JOIN dim ON fk = k"
         " WHERE x % 7 = 0")
    r1 = con.sql(q).rows()
    r2 = con.sql(q).rows()  # warm: cached probe mapping
    r3 = con.sql(q).rows()
    assert r1 == r2 == r3
    # probe-side DML: new rows must join
    con.sql("INSERT INTO fact VALUES (5, 700000)")
    r4 = con.sql(q).rows()
    assert r4[0][0] == r1[0][0] + 5 * 10 + 700000
    # build-side DML: changed dimension values must be observed
    con.sql("UPDATE dim SET v = v + 1 WHERE k = 5")
    r5 = con.sql(q).rows()
    assert r5[0][0] > r4[0][0]
