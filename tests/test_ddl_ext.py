"""ALTER TABLE and sequences (reference: duck_table_entry.cpp alter paths,
sequence catalog entries + nextval)."""

import pytest


@pytest.fixture()
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE t (a INT)")
    c.sql("INSERT INTO t VALUES (1),(2)")
    return c


def test_add_column_nulls(con):
    con.sql("ALTER TABLE t ADD COLUMN b VARCHAR")
    assert con.sql("SELECT * FROM t ORDER BY a").rows() == [
        (1, None), (2, None)]


def test_rename_column_and_update(con):
    con.sql("ALTER TABLE t ADD COLUMN b VARCHAR")
    con.sql("ALTER TABLE t RENAME COLUMN b TO label")
    con.sql("UPDATE t SET label = 'x' WHERE a = 1")
    assert con.sql("SELECT label FROM t ORDER BY a").rows() == [
        ("x",), (None,)]


def test_drop_column(con):
    con.sql("ALTER TABLE t ADD COLUMN b INT")
    con.sql("ALTER TABLE t DROP COLUMN b")
    assert con.sql("SELECT * FROM t ORDER BY a").rows() == [(1,), (2,)]


def test_rename_table(con):
    con.sql("ALTER TABLE t RENAME TO t2")
    assert con.sql("SELECT count(*) FROM t2").rows() == [(2,)]
    with pytest.raises(Exception):
        con.sql("SELECT * FROM t")


def test_sequences(con):
    con.sql("CREATE SEQUENCE seq START 5 INCREMENT BY 2")
    assert con.sql("SELECT nextval('seq')").rows() == [(5,)]
    assert con.sql("SELECT nextval('seq'), currval('seq')"
                   ).rows() == [(7, 7)]
    # one value per LIVE row (padding must not consume values)
    rows = con.sql("SELECT a, nextval('seq') FROM t ORDER BY a").rows()
    assert [r[1] for r in rows] == [9, 11]
    assert con.sql("SELECT currval('seq')").rows() == [(11,)]
