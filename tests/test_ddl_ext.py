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


def test_schema_namespaces():
    """CREATE SCHEMA + qualified names (reference: CREATE SCHEMA,
    src/catalog/catalog_entry/schema_catalog_entry.cpp)."""
    import duckdb_tpu
    import pytest

    con = duckdb_tpu.connect()
    con.sql("CREATE SCHEMA s1")
    con.sql("CREATE TABLE s1.t (a INT)")
    con.sql("INSERT INTO s1.t VALUES (1), (2)")
    assert con.sql("SELECT sum(a) FROM s1.t").rows() == [(3,)]
    # same bare name in main is a different table
    con.sql("CREATE TABLE t (a INT)")
    con.sql("INSERT INTO t VALUES (10)")
    assert con.sql("SELECT sum(a) FROM t").rows() == [(10,)]
    assert con.sql("SELECT sum(a) FROM main.t").rows() == [(10,)]
    rows = con.sql("SELECT name, schema_name FROM duckdb_tables()"
                   " ORDER BY schema_name, name").rows()
    assert ("t", "s1") in rows and ("t", "main") in rows
    with pytest.raises(Exception, match="does not exist"):
        con.sql("CREATE TABLE nope.t2 (a INT)")
    with pytest.raises(Exception, match="Dependency Error"):
        con.sql("DROP SCHEMA s1")
    con.sql("DROP SCHEMA s1 CASCADE")
    assert not con.catalog.has_table("s1.t")
    con.sql("UPDATE t SET a = 11")
    con.sql("DELETE FROM main.t WHERE a = 11")
    assert con.sql("SELECT count(*) FROM t").rows() == [(0,)]


def test_schema_persistence(tmp_path):
    import duckdb_tpu
    from duckdb_tpu.api.connection import _OPEN_DBS

    db = str(tmp_path / "db")
    con = duckdb_tpu.connect(db)
    con.sql("CREATE SCHEMA app")
    con.sql("CREATE TABLE app.users (id INT)")
    con.sql("INSERT INTO app.users VALUES (7)")
    con.sql("CHECKPOINT")
    _OPEN_DBS.clear()
    con2 = duckdb_tpu.connect(db)
    assert con2.sql("SELECT id FROM app.users").rows() == [(7,)]
    assert "app" in con2.catalog.schemas
