"""DDL/DML surface added for reference parity: column DEFAULTs,
RETURNING, DELETE USING, INSERT BY NAME / FROM / DEFAULT VALUES,
CREATE/DROP INDEX (+ UNIQUE enforcement), COMMENT ON, SQL-level
PREPARE/EXECUTE/DEALLOCATE, ALTER COLUMN TYPE/DEFAULT/NOT NULL,
reference-compat settings.

Reference: src/parser/statement/*, src/catalog/catalog_entry/
duck_table_entry.cpp alter paths, comment_on, prepare_statement.
"""

import os
import subprocess

import pytest

import duckdb_tpu
from tests._refbin import REF_BIN


def _ref(sql: str):
    out = subprocess.run([REF_BIN, "-csv", "-noheader", "-nullvalue", "NULL"],
                         input=sql, capture_output=True, text=True)
    return out


def test_column_defaults_and_default_values():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t(i INT, j INT DEFAULT 42, s VARCHAR DEFAULT 'x')")
    con.sql("INSERT INTO t(i) VALUES (1)")
    assert con.sql("SELECT * FROM t").fetchall() == [(1, 42, "x")]
    con.sql("INSERT INTO t DEFAULT VALUES")
    assert con.sql("SELECT count(*) FROM t WHERE j = 42").fetchall() == [(2,)]


def test_default_sequence_advances_per_row():
    con = duckdb_tpu.connect()
    con.sql("CREATE SEQUENCE sq")
    con.sql("CREATE TABLE t(id INT DEFAULT nextval('sq'), v INT)")
    con.sql("INSERT INTO t(v) VALUES (10), (20), (30)")
    assert [r[0] for r in con.sql("SELECT id FROM t ORDER BY v").fetchall()] \
        == [1, 2, 3]


def test_returning():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t(i INT, j INT DEFAULT 7)")
    assert con.sql("INSERT INTO t(i) VALUES (1), (2) RETURNING i + j AS k"
                   ).fetchall() == [(8,), (9,)]
    assert con.sql("UPDATE t SET j = 100 WHERE i = 2 RETURNING *"
                   ).fetchall() == [(2, 100)]
    assert con.sql("DELETE FROM t WHERE i = 1 RETURNING i, j"
                   ).fetchall() == [(1, 7)]


def test_delete_using():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE a(x INT); INSERT INTO a VALUES (1), (2), (3)")
    con.sql("DELETE FROM a USING (VALUES (2), (3)) v(y) WHERE a.x = v.y")
    assert con.sql("SELECT * FROM a").fetchall() == [(1,)]


def test_insert_by_name_and_from():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE b(y INT, z INT)")
    con.sql("INSERT INTO b BY NAME (SELECT 4 AS z, 9 AS y)")
    assert con.sql("SELECT y, z FROM b").fetchall() == [(9, 4)]
    con.sql("CREATE TABLE c(v BIGINT)")
    con.sql("INSERT INTO c FROM range(3)")
    assert con.sql("SELECT count(*) FROM c").fetchall() == [(3,)]


def test_create_index_and_unique_enforcement():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t(i INT, j INT)")
    con.sql("INSERT INTO t VALUES (1, 1), (2, 1)")
    con.sql("CREATE INDEX plain ON t(j)")
    con.sql("CREATE UNIQUE INDEX u ON t(i)")
    rows = con.sql("SELECT index_name, is_unique FROM duckdb_indexes() "
                   "ORDER BY 1").fetchall()
    assert rows == [("plain", False), ("u", True)]
    with pytest.raises(Exception, match="[Cc]onstraint"):
        con.sql("INSERT INTO t VALUES (1, 5)")
    con.sql("DROP INDEX u")
    con.sql("INSERT INTO t VALUES (1, 5)")  # constraint retired
    with pytest.raises(Exception, match="does not exist"):
        con.sql("DROP INDEX nope")
    con.sql("DROP INDEX IF EXISTS nope")
    # duplicate data blocks UNIQUE index creation
    with pytest.raises(Exception, match="duplicates"):
        con.sql("CREATE UNIQUE INDEX u2 ON t(i)")


def test_comment_on():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t(i INT)")
    con.sql("COMMENT ON TABLE t IS 'tbl comment'")
    con.sql("COMMENT ON COLUMN t.i IS 'col comment'")
    assert con.sql("SELECT comment FROM duckdb_tables() WHERE name='t'"
                   ).fetchall() == [("tbl comment",)]
    assert con.sql("SELECT comment FROM duckdb_columns() "
                   "WHERE column_name='i'").fetchall() == [("col comment",)]
    con.sql("COMMENT ON TABLE t IS NULL")
    assert con.sql("SELECT comment FROM duckdb_tables() WHERE name='t'"
                   ).fetchall() == [(None,)]


def test_prepare_execute_deallocate():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t(i INT); INSERT INTO t VALUES (1), (2), (3)")
    con.sql("PREPARE q AS SELECT count(*) FROM t WHERE i >= ?")
    assert con.sql("EXECUTE q(2)").fetchall() == [(2,)]
    con.sql("PREPARE q2 AS SELECT $1 + $2")
    assert con.sql("EXECUTE q2(3, 4)").fetchall() == [(7,)]
    con.sql("DEALLOCATE q")
    with pytest.raises(Exception, match="does not exist"):
        con.sql("EXECUTE q(1)")


def test_alter_column_type_default_not_null():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t(i INT, j INT)")
    con.sql("INSERT INTO t VALUES (1, 10), (2, 20)")
    con.sql("ALTER TABLE t ALTER COLUMN j SET DATA TYPE VARCHAR")
    assert con.sql("SELECT j FROM t ORDER BY i").fetchall() == [
        ("10",), ("20",)]
    con.sql("ALTER TABLE t ALTER i SET DEFAULT 99")
    con.sql("INSERT INTO t(j) VALUES ('z')")
    assert con.sql("SELECT i FROM t WHERE j='z'").fetchall() == [(99,)]
    con.sql("ALTER TABLE t ALTER i DROP DEFAULT")
    con.sql("ALTER TABLE t ALTER COLUMN i SET NOT NULL")
    with pytest.raises(Exception, match="NOT NULL"):
        con.sql("INSERT INTO t(j) VALUES ('w')")
    con.sql("ALTER TABLE t ALTER COLUMN i DROP NOT NULL")
    con.sql("INSERT INTO t(j) VALUES ('w')")
    con.sql("ALTER TABLE t ADD COLUMN k INT DEFAULT 5")
    assert set(r[0] for r in con.sql("SELECT k FROM t").fetchall()) == {5}


def test_alter_type_using():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t(v INT)")
    con.sql("INSERT INTO t VALUES (1), (2)")
    con.sql("ALTER TABLE t ALTER v TYPE VARCHAR USING 'n' || CAST(v AS "
            "VARCHAR)")
    assert con.sql("SELECT v FROM t ORDER BY v").fetchall() == [
        ("n1",), ("n2",)]


def test_compat_settings_accepted():
    con = duckdb_tpu.connect()
    con.sql("SET debug_force_external = true")
    con.sql("SET immediate_transaction_mode = true")
    con.sql("SET wal_autocheckpoint = '32MB'")  # alias of checkpoint_threshold
    assert con.sql("SELECT value FROM duckdb_settings() WHERE "
                   "name='checkpoint_threshold'").fetchall() == [("32MB",)]
    con.sql("RESET debug_force_external")
    with pytest.raises(Exception, match="unrecognized"):
        con.sql("SET no_such_setting_xyz = 1")


def test_vacuum_analyze_truncate():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t(i INT); INSERT INTO t VALUES (1)")
    con.sql("VACUUM")
    con.sql("ANALYZE")
    con.sql("TRUNCATE t")
    assert con.sql("SELECT count(*) FROM t").fetchall() == [(0,)]


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
def test_returning_matches_reference():
    sql = ("CREATE TABLE t(i INT, j INT DEFAULT 3);"
           "INSERT INTO t(i) VALUES (1),(2) RETURNING i*10+j;")
    con = duckdb_tpu.connect()
    mine = []
    for st in sql.split(";"):
        if st.strip():
            r = con.sql(st)
            if r is not None and st.strip().startswith("INSERT"):
                mine = sorted(x[0] for x in r.fetchall())
    out = _ref(sql)
    theirs = sorted(int(line) for line in out.stdout.strip().splitlines())
    assert mine == theirs
