"""MERGE INTO — differential vs the reference binary."""

import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

SETUP = ("CREATE TABLE tgt (id INT, v VARCHAR, amt INT); "
         "CREATE TABLE src (id INT, v VARCHAR, amt INT); "
         "INSERT INTO tgt VALUES (1,'a',10),(2,'b',20),(3,'c',30); "
         "INSERT INTO src VALUES (2,'B',200),(3,'C',-1),(4,'d',40);")


def _run(con, sql):
    for stmt in sql.split(";"):
        if stmt.strip():
            con.sql(stmt)


def _norm(rows):
    return ["|".join("NULL" if v is None else str(v) for v in r)
            for r in rows]


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
def test_merge_full():
    import duckdb_tpu

    merge = ("MERGE INTO tgt USING src ON tgt.id = src.id "
             "WHEN MATCHED AND src.amt < 0 THEN DELETE "
             "WHEN MATCHED THEN UPDATE SET v = src.v, amt = src.amt "
             "WHEN NOT MATCHED THEN INSERT VALUES (src.id, src.v, src.amt)")
    check = "SELECT * FROM tgt ORDER BY id"
    con = duckdb_tpu.connect()
    _run(con, SETUP)
    con.sql(merge)
    got = _norm(con.sql(check).rows())
    ref = subprocess.run(
        [REF_BIN, "-list", "-noheader", "-c", SETUP + merge + "; " + check],
        capture_output=True, text=True).stdout.splitlines()
    assert got == ref


def test_merge_update_only():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    _run(con, SETUP)
    con.sql("MERGE INTO tgt USING src ON tgt.id = src.id "
            "WHEN MATCHED THEN UPDATE SET amt = tgt.amt + src.amt")
    assert con.sql("SELECT sum(amt) FROM tgt").rows() == [(10 + 220 + 29,)]


def test_merge_insert_only():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    _run(con, SETUP)
    con.sql("MERGE INTO tgt USING src ON tgt.id = src.id "
            "WHEN NOT MATCHED THEN INSERT VALUES (src.id, src.v, src.amt)")
    assert con.sql("SELECT count(*) FROM tgt").rows() == [(4,)]
