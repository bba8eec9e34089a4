"""PRIMARY KEY / UNIQUE / NOT NULL / CHECK constraint enforcement on append
(reference: VerifyAppendConstraints,
src/storage/table/row_group_collection.cpp)."""

import pytest


@pytest.fixture()
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE p (id INT PRIMARY KEY, name VARCHAR NOT NULL, "
          "age INT CHECK (age >= 0), email VARCHAR UNIQUE)")
    c.sql("INSERT INTO p VALUES (1, 'alice', 30, 'a@x.com')")
    return c


def _fails(con, q, frag):
    with pytest.raises(Exception, match=frag):
        con.sql(q)


def test_primary_key_duplicate(con):
    _fails(con, "INSERT INTO p VALUES (1,'b',1,'b@x')", "PRIMARY KEY")


def test_not_null(con):
    _fails(con, "INSERT INTO p VALUES (2, NULL, 1, 'b@x')", "NOT NULL")
    _fails(con, "INSERT INTO p (id, age) VALUES (2, 1)", "NOT NULL")


def test_check(con):
    _fails(con, "INSERT INTO p VALUES (2,'b',-5,'b@x')", "CHECK")


def test_unique(con):
    _fails(con, "INSERT INTO p VALUES (2,'b',1,'a@x.com')", "UNIQUE")
    # NULLs never collide under UNIQUE
    con.sql("INSERT INTO p VALUES (2,'b',1,NULL), (3,'c',1,NULL)")
    assert con.sql("SELECT count(*) FROM p").rows() == [(3,)]


def test_failed_insert_appends_nothing(con):
    _fails(con, "INSERT INTO p VALUES (9,'z',1,'z@x'),(9,'y',1,'y@x')",
           "PRIMARY KEY")
    assert con.sql("SELECT count(*) FROM p").rows() == [(1,)]


def test_table_level_composite(con):
    con.sql("CREATE TABLE c2 (a INT, b INT, PRIMARY KEY (a, b), "
            "CHECK (a < b))")
    con.sql("INSERT INTO c2 VALUES (1, 2), (1, 3)")
    _fails(con, "INSERT INTO c2 VALUES (1, 2)", "PRIMARY KEY")
    _fails(con, "INSERT INTO c2 VALUES (5, 4)", "CHECK")
    _fails(con, "INSERT INTO c2 VALUES (NULL, 4)", "NOT NULL")


def test_foreign_key_parses(con):
    con.sql("CREATE TABLE c3 (x INT REFERENCES p (id), "
            "FOREIGN KEY (x) REFERENCES p (id))")
    # FK is enforced now (see test_foreign_keys.py): 99 is absent from p
    import pytest as _pytest
    with _pytest.raises(Exception, match="foreign key"):
        con.sql("INSERT INTO c3 VALUES (99)")


def test_constraints_survive_reopen(tmp_path):
    import duckdb_tpu

    db = str(tmp_path / "cdb")
    c = duckdb_tpu.connect(db)
    c.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT CHECK (v > 0))")
    c.sql("INSERT INTO t VALUES (1, 5)")
    c.close()
    c2 = duckdb_tpu.connect(db)
    _fails(c2, "INSERT INTO t VALUES (1, 5)", "PRIMARY KEY")
    _fails(c2, "INSERT INTO t VALUES (2, -1)", "CHECK")
    c2.sql("INSERT INTO t VALUES (2, 9)")
    assert c2.sql("SELECT count(*) FROM t").rows() == [(2,)]


def test_update_constraints(con):
    """UPDATE verifies against the post-update state before committing
    (reference: VerifyUpdateConstraints, src/storage/data_table.cpp)."""
    con.sql("INSERT INTO p VALUES (2, 'b', 20, 'b@x')")
    _fails(con, "UPDATE p SET id = 1 WHERE id = 2", "PRIMARY KEY")
    _fails(con, "UPDATE p SET name = NULL WHERE id = 1", "NOT NULL")
    _fails(con, "UPDATE p SET age = -5 WHERE id = 2", "CHECK")
    # multi-assignment failure commits nothing
    _fails(con, "UPDATE p SET age = age + 1, id = 1 WHERE id = 2",
           "PRIMARY KEY")
    assert con.sql("SELECT age FROM p WHERE id = 2").rows() == [(20,)]
    con.sql("UPDATE p SET id = 3 WHERE id = 2")  # legal key move
    assert con.sql("SELECT id FROM p ORDER BY id").rows() == [(1,), (3,)]


def test_on_conflict_upsert():
    """INSERT ... ON CONFLICT (reference: physical_insert.cpp upsert)."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT, s VARCHAR)")
    con.sql("INSERT INTO t VALUES (1, 10, 'a')")
    con.sql("INSERT INTO t VALUES (1, 99, 'z') ON CONFLICT DO NOTHING")
    assert con.sql("SELECT * FROM t").rows() == [(1, 10, "a")]
    con.sql("INSERT INTO t VALUES (1, 99, 'z'), (2, 5, 'b') "
            "ON CONFLICT DO UPDATE SET v = excluded.v")
    assert con.sql("SELECT * FROM t ORDER BY id").rows() == [
        (1, 99, "a"), (2, 5, "b")]
    con.sql("INSERT OR REPLACE INTO t VALUES (2, 77, 'B')")
    assert con.sql("SELECT * FROM t ORDER BY id").rows() == [
        (1, 99, "a"), (2, 77, "B")]
    con.sql("INSERT OR IGNORE INTO t VALUES (2, 0, 'x'), (3, 1, 'c')")
    assert con.sql("SELECT count(*) FROM t").rows() == [(3,)]
    con.sql("INSERT INTO t VALUES (3, 0, 'k') "
            "ON CONFLICT (id) DO UPDATE SET s = 'fixed'")
    assert con.sql("SELECT s FROM t WHERE id = 3").rows() == [("fixed",)]


def test_unique_index_advances_in_place():
    """The persistent key index (ART analog) must advance across inserts
    (O(delta) verification) and survive the MVCC publish of each statement."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a INT PRIMARY KEY)")
    con.sql("INSERT INTO t VALUES (1), (2)")
    con.sql("INSERT INTO t VALUES (3)")
    entry = con.catalog.get_table("t")
    idx = entry.__dict__["_uniq_indexes"][("a",)]
    assert idx["version"] == getattr(entry, "version", 0)
    assert idx["set"] == {"1", "2", "3"}
    # rollback leaves a stale index; the next insert must rebuild, not
    # wrongly reject/accept
    con.sql("BEGIN")
    con.sql("INSERT INTO t VALUES (4)")
    con.sql("ROLLBACK")
    con.sql("INSERT INTO t VALUES (4)")  # must succeed (4 was rolled back)
    import pytest

    with pytest.raises(Exception, match="PRIMARY KEY"):
        con.sql("INSERT INTO t VALUES (2)")
    assert con.sql("SELECT count(*) FROM t").rows() == [(4,)]
