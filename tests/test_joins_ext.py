"""FULL OUTER and USING joins — differential vs the reference binary."""

import os
import subprocess

import pytest

REF_BIN = "/root/build-duckdb/duckdb"

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
