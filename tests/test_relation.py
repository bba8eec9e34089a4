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
