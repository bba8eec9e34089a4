"""CSV / Parquet ingest + COPY round trips + table functions."""

import os

import pytest


@pytest.fixture()
def con(tmp_path):
    import duckdb_tpu

    return duckdb_tpu.connect()


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "people.csv"
    p.write_text("name,age,score,joined\n"
                 "alice,30,9.5,2020-01-15\n"
                 "bob,25,,2021-06-01\n"
                 "carol,35,7.25,2019-12-31\n")
    return str(p)


def test_file_replacement_scan(con, csv_file):
    rows = con.sql(f"SELECT name, age FROM '{csv_file}' ORDER BY age").rows()
    assert rows == [("bob", 25), ("alice", 30), ("carol", 35)]


def test_read_csv_function(con, csv_file):
    rows = con.sql(f"SELECT count(*), avg(age) FROM read_csv('{csv_file}')").rows()
    assert rows == [(3, 30.0)]


def test_csv_null_sniffing(con, csv_file):
    rows = con.sql(f"SELECT name FROM '{csv_file}' WHERE score IS NULL").rows()
    assert rows == [("bob",)]


def test_copy_from_and_to(con, csv_file, tmp_path):
    con.sql("CREATE TABLE p (name VARCHAR, age INT, score DOUBLE, joined DATE)")
    con.sql(f"COPY p FROM '{csv_file}' (HEADER)")
    assert con.sql("SELECT count(*) FROM p").rows() == [(3,)]
    out = tmp_path / "out.csv"
    con.sql(f"COPY (SELECT name, age*2 AS dbl FROM p ORDER BY name) TO '{out}'")
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "name,dbl"
    assert lines[1] == "alice,60"


def test_copy_from_appends(con, csv_file):
    con.sql("CREATE TABLE p (name VARCHAR, age INT, score DOUBLE, joined DATE)")
    con.sql(f"COPY p FROM '{csv_file}' (HEADER)")
    con.sql(f"COPY p FROM '{csv_file}' (HEADER)")
    assert con.sql("SELECT count(*) FROM p").rows() == [(6,)]
    assert con.sql("SELECT count(DISTINCT name) FROM p").rows() == [(3,)]


def test_parquet_round_trip(con, csv_file, tmp_path):
    con.sql("CREATE TABLE p (name VARCHAR, age INT, score DOUBLE, joined DATE)")
    con.sql(f"COPY p FROM '{csv_file}' (HEADER)")
    pq = tmp_path / "p.parquet"
    con.sql(f"COPY p TO '{pq}' (FORMAT PARQUET)")
    rows = con.sql(f"SELECT name, joined FROM '{pq}' ORDER BY name").rows()
    assert rows[0][0] == "alice"
    assert str(rows[0][1]) == "2020-01-15"
    # NULL survives the round trip
    assert con.sql(f"SELECT count(*) FROM '{pq}' WHERE score IS NULL").rows() \
        == [(1,)]


def test_range_functions(con):
    assert con.sql("SELECT sum(range) FROM range(10)").rows() == [(45,)]
    assert con.sql("SELECT count(*) FROM generate_series(1,5)").rows() == [(5,)]
    assert con.sql("SELECT min(range), max(range) FROM range(2, 10, 3)").rows() \
        == [(2, 8)]


def test_memory_limit_eviction():
    """memory_limit setting caps device-resident bytes with LRU eviction
    (reference BufferManager, src/storage/standard_buffer_manager.cpp)."""
    import duckdb_tpu
    from duckdb_tpu.catalog.catalog import POOL

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE big AS SELECT range AS a, range * 2 AS b, "
            "range * 3 AS c FROM range(20000)")
    con.sql("SET memory_limit = '200KB'")
    con.sql("SELECT sum(a) FROM big")
    con.sql("SELECT sum(b) FROM big")
    con.sql("SELECT sum(c) FROM big")
    assert POOL.limit == 200 * 1024
    # eviction keeps at most ~one 20k-row int column + slack resident
    assert POOL.used <= 2 * POOL.limit
    # evicted columns transparently re-promote from the host tier
    assert con.sql("SELECT sum(a) FROM big").rows() == [(199990000,)]
    con.sql("SET memory_limit = '0B'")  # unlimited again for other tests
    con.sql("DROP TABLE big")


def test_export_import_database(tmp_path):
    """EXPORT DATABASE writes schema.sql + load.sql + per-table data files;
    IMPORT DATABASE reconstructs (reference: physical_export.cpp)."""
    import datetime
    import decimal
    import os
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a INT, b VARCHAR, d DECIMAL(6,2))")
    con.sql("INSERT INTO t VALUES (1,'x',1.25),(2,'y',3.50)")
    con.sql("CREATE TABLE u (k DATE)")
    con.sql("INSERT INTO u VALUES ('2024-01-05')")
    d = str(tmp_path / "exp")
    con.sql(f"EXPORT DATABASE '{d}'")
    assert sorted(os.listdir(d)) == ["load.sql", "schema.sql", "t.csv",
                                     "u.csv"]
    con2 = duckdb_tpu.connect()
    con2.sql(f"IMPORT DATABASE '{d}'")
    assert con2.sql("SELECT * FROM t ORDER BY a").rows() == [
        (1, "x", decimal.Decimal("1.25")), (2, "y", decimal.Decimal("3.50"))]
    assert con2.sql("SELECT * FROM u").rows() == [
        (datetime.date(2024, 1, 5),)]
