"""PIVOT / UNPIVOT and aggregate FILTER clauses.

Desugared over the data: PIVOT becomes one FILTERed aggregate per distinct
ON value, UNPIVOT a UNION ALL of per-column selects (reference:
src/parser/transform/statement/transform_pivot_stmt.cpp). Expectations
are the reference binary's own output.
"""

import pytest


@pytest.fixture()
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE sales (year INT, region VARCHAR, amt INT)")
    c.sql("INSERT INTO sales VALUES (2023,'east',10),(2023,'west',20),"
          "(2024,'east',5)")
    return c


def test_pivot_basic(con):
    r = con.sql("PIVOT sales ON region USING sum(amt)")
    assert r.names == ["year", "east", "west"]
    assert r.rows() == [(2023, 10, 20), (2024, 5, None)]


def test_pivot_in_list_and_group(con):
    r = con.sql("PIVOT sales ON region IN ('east') USING sum(amt) "
                "GROUP BY year")
    assert r.names == ["year", "east"]
    assert r.rows() == [(2023, 10), (2024, 5)]


def test_unpivot(con):
    rows = sorted(con.sql("UNPIVOT sales ON year, amt INTO NAME k VALUE v"
                          ).rows())
    assert rows == [("east", "amt", 5), ("east", "amt", 10),
                    ("east", "year", 2023), ("east", "year", 2024),
                    ("west", "amt", 20), ("west", "year", 2023)]


def test_aggregate_filter_clause(con):
    rows = con.sql("SELECT year, sum(amt) FILTER (region = 'east'), "
                   "count(*) FILTER (WHERE region = 'west') FROM sales "
                   "GROUP BY year ORDER BY year").rows()
    assert rows == [(2023, 10, 1), (2024, 5, 0)]
