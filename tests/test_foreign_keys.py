"""FOREIGN KEY enforcement (insert + delete sides).

Reference: src/storage/data_table.cpp VerifyAppendForeignKeyConstraint /
VerifyDeleteForeignKeyConstraint; src/parser/constraint.hpp.
"""

import pytest

import duckdb_tpu


@pytest.fixture
def con():
    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE parent (id INT PRIMARY KEY, name VARCHAR)")
    c.sql("INSERT INTO parent VALUES (1, 'a'), (2, 'b')")
    return c


def test_fk_insert_ok_and_violation(con):
    con.sql("CREATE TABLE child (cid INT, pid INT REFERENCES parent (id))")
    con.sql("INSERT INTO child VALUES (10, 1), (11, NULL)")  # NULL passes
    assert con.sql("SELECT count(*) FROM child").rows() == [(2,)]
    with pytest.raises(Exception, match="foreign key"):
        con.sql("INSERT INTO child VALUES (12, 99)")


def test_fk_delete_blocked_then_allowed(con):
    con.sql("CREATE TABLE child (cid INT, pid INT REFERENCES parent (id))")
    con.sql("INSERT INTO child VALUES (10, 1)")
    with pytest.raises(Exception, match="still referenced"):
        con.sql("DELETE FROM parent WHERE id = 1")
    con.sql("DELETE FROM parent WHERE id = 2")  # unreferenced key
    con.sql("DELETE FROM child WHERE pid = 1")
    con.sql("DELETE FROM parent WHERE id = 1")
    assert con.sql("SELECT count(*) FROM parent").rows() == [(0,)]


def test_fk_table_level_defaults_to_parent_pk(con):
    con.sql("CREATE TABLE c2 (x INT, y INT, FOREIGN KEY (y) "
            "REFERENCES parent)")
    con.sql("INSERT INTO c2 VALUES (1, 1)")
    with pytest.raises(Exception, match="does not exist in the referenced"):
        con.sql("INSERT INTO c2 VALUES (1, 42)")


def test_fk_persists(tmp_path):
    db = str(tmp_path / "fkdb")
    con = duckdb_tpu.connect(db)
    con.sql("CREATE TABLE p (id INT PRIMARY KEY)")
    con.sql("CREATE TABLE c (pid INT REFERENCES p (id))")
    con.sql("INSERT INTO p VALUES (1)")
    con.close()
    con2 = duckdb_tpu.connect(db)
    con2.sql("INSERT INTO c VALUES (1)")
    with pytest.raises(Exception, match="foreign key"):
        con2.sql("INSERT INTO c VALUES (7)")
    con2.close()
