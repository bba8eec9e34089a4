"""ATTACH / DETACH: multi-database catalogs under aliases.

Reference: src/main/attached_database.cpp, src/parser/statement/
attach_statement (ATTACH 'path' AS alias, READ_ONLY option),
test/sql/attach/. Documented divergence: attached writes persist via
full checkpoint at CHECKPOINT/DETACH/close instead of per-statement WAL.
"""

import pytest

import duckdb_tpu
from duckdb_tpu.api.connection import _OPEN_DBS


@pytest.fixture
def extdb(tmp_path):
    path = str(tmp_path / "ext_db")
    c = duckdb_tpu.connect(path)
    c.sql("CREATE TABLE items (id INT, name VARCHAR)")
    c.sql("INSERT INTO items VALUES (1, 'hammer'), (2, 'wrench')")
    c.sql("CREATE VIEW big AS SELECT * FROM items WHERE id > 1")
    c.close()
    _OPEN_DBS.clear()
    return path


def test_attach_read(extdb):
    con = duckdb_tpu.connect()
    con.sql(f"ATTACH '{extdb}' AS ext")
    assert con.sql("SELECT * FROM ext.items ORDER BY id").rows() == \
        [(1, "hammer"), (2, "wrench")]
    # attached view resolves inside its own database's namespace
    assert con.sql("SELECT * FROM ext.big").rows() == [(2, "wrench")]


def test_attach_write_persists_through_detach(extdb):
    con = duckdb_tpu.connect()
    con.sql(f"ATTACH '{extdb}' AS ext")
    con.sql("INSERT INTO ext.items VALUES (3, 'saw')")
    con.sql("DETACH ext")
    with pytest.raises(Exception, match="does not exist"):
        con.sql("SELECT * FROM ext.items")
    _OPEN_DBS.clear()
    c2 = duckdb_tpu.connect(extdb)
    assert c2.sql("SELECT count(*) FROM items").rows() == [(3,)]
    c2.close()


def test_attach_read_only(extdb):
    con = duckdb_tpu.connect()
    con.sql(f"ATTACH '{extdb}' AS ro (READ_ONLY)")
    with pytest.raises(Exception, match="read-only"):
        con.sql("INSERT INTO ro.items VALUES (9, 'x')")
    with pytest.raises(Exception, match="read-only"):
        con.sql("CREATE TABLE ro.t2 (a INT)")
    assert con.sql("SELECT count(*) FROM ro.items").rows() == [(2,)]


def test_attach_memory_database():
    con = duckdb_tpu.connect()
    con.sql("ATTACH ':memory:' AS scratch")
    con.sql("CREATE TABLE scratch.t (a INT)")
    con.sql("INSERT INTO scratch.t VALUES (5)")
    assert con.sql("SELECT * FROM scratch.t").rows() == [(5,)]
    con.sql("DETACH scratch")


def test_cross_database_join(extdb):
    con = duckdb_tpu.connect()
    con.sql(f"ATTACH '{extdb}' AS ext")
    con.sql("CREATE TABLE loc (id INT, qty INT)")
    con.sql("INSERT INTO loc VALUES (1, 7), (3, 9)")
    rows = con.sql("SELECT r.name, l.qty FROM ext.items r "
                   "JOIN loc l ON r.id = l.id").rows()
    assert rows == [("hammer", 7)]


def test_attach_errors(extdb):
    con = duckdb_tpu.connect()
    con.sql(f"ATTACH '{extdb}' AS ext")
    with pytest.raises(Exception, match="already"):
        con.sql(f"ATTACH '{extdb}' AS ext2")   # same file twice
    with pytest.raises(Exception, match="already"):
        con.sql("ATTACH ':memory:' AS ext")    # alias collision
    con.sql(f"ATTACH IF NOT EXISTS '{extdb}' AS ext")  # no-op
    with pytest.raises(Exception, match="does not exist"):
        con.sql("DETACH nope")
    con.sql("DETACH IF EXISTS nope")


def test_default_alias(extdb):
    con = duckdb_tpu.connect()
    con.sql(f"ATTACH '{extdb}'")  # alias derived from basename
    assert con.sql("SELECT count(*) FROM ext_db.items").rows() == [(2,)]
