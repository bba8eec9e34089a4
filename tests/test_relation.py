"""Relation API + prepared statements."""

import pytest


@pytest.fixture()
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE people (name VARCHAR, age INT, city VARCHAR)")
    c.sql("INSERT INTO people VALUES ('alice',30,'NYC'),('bob',25,'LA'),"
          "('carol',35,'NYC')")
    return c


def test_filter_project_order(con):
    r = (con.table("people").filter("age > 26")
         .project("name", "age").order("age DESC"))
    assert r.fetchall() == [("carol", 35), ("alice", 30)]


def test_aggregate(con):
    rows = (con.table("people")
            .aggregate("count(*) AS n, avg(age) AS a", "city")
            .order("city").fetchall())
    assert rows == [("LA", 1, 25.0), ("NYC", 2, 32.5)]


def test_count_and_limit(con):
    assert con.table("people").count() == 3
    assert len(con.table("people").order("age").limit(2).fetchall()) == 2


def test_join(con):
    con.sql("CREATE TABLE cities (city VARCHAR, pop INT)")
    con.sql("INSERT INTO cities VALUES ('NYC', 8), ('LA', 4)")
    r = con.table("people").set_alias("p").join(
        con.table("cities").set_alias("c"), "p.city = c.city")
    assert r.count() == 3


def test_prepared(con):
    ps = con.prepare("SELECT name FROM people WHERE age > ? AND city = ?")
    assert ps.execute(26, "NYC").rows() == [("alice",), ("carol",)]
    assert ps.execute(100, "NYC").rows() == []


def test_create_and_df(con):
    con.table("people").filter("age >= 30").create("elders")
    assert con.sql("SELECT count(*) FROM elders").rows() == [(2,)]
    df = con.table("people").df()
    assert df.shape == (3, 3)


def test_setops(con):
    a = con.from_query("SELECT name FROM people WHERE age > 26")
    b = con.from_query("SELECT name FROM people WHERE city = 'NYC'")
    assert a.intersect(b).count() == 2
    assert sorted(a.union(b).fetchall()) == sorted(
        [("alice",), ("carol",), ("alice",), ("carol",)])


def test_dataframe_round_trip(con):
    import pandas as pd

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", None]})
    con.from_df(df, "t2")
    r = con.sql("SELECT a, b FROM t2 ORDER BY a")
    assert r.fetchall() == [(1, "x"), (2, "y"), (3, None)]
    assert r.df().shape == (3, 2)
    assert r.arrow().num_rows == 3
    assert list(r.fetchnumpy()["a"]) == [1, 2, 3]


def test_module_level_api():
    """duckdb python parity: module-level sql/query/execute/table/from_df
    over a lazily-created default connection."""
    import duckdb_tpu

    assert duckdb_tpu.sql("SELECT 1+1").rows() == [(2,)]
    duckdb_tpu.execute("CREATE OR REPLACE TABLE _mod (a INT)")
    duckdb_tpu.execute("INSERT INTO _mod VALUES (5), (7)")
    assert duckdb_tpu.query("SELECT sum(a) FROM _mod").rows() == [(12,)]
    assert duckdb_tpu.table("_mod").count() == 2
    # the internal SQL subpackage stays importable despite the shadow
    from duckdb_tpu.sql.parser import Parser  # noqa: F401
