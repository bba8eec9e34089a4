"""Persistence: checkpoint, WAL replay (crash recovery), transactions,
system table functions, EXPLAIN ANALYZE."""

import os

import pytest


def _connect(path):
    import duckdb_tpu

    return duckdb_tpu.connect(path)


def _crash():
    """Simulate a process crash: drop the same-process database registry so
    the next connect() replays catalog + WAL from disk (in-process, a second
    connect to the same path attaches to the live shared instance)."""
    from duckdb_tpu.api.connection import _OPEN_DBS

    _OPEN_DBS.clear()


def test_wal_replay(tmp_path):
    db = str(tmp_path / "db")
    con = _connect(db)
    con.sql("CREATE TABLE t (a INT, b VARCHAR, c DECIMAL(10,2))")
    con.sql("INSERT INTO t VALUES (1,'x',1.50),(2,NULL,2.25),(3,'z',NULL)")
    assert os.path.exists(os.path.join(db, "wal.sql"))
    # "crash" (no checkpoint) → reopen after process death replays the WAL
    _crash()
    con2 = _connect(db)
    rows = con2.sql("SELECT * FROM t ORDER BY a").rows()
    assert rows[0] == (1, "x", __import__("decimal").Decimal("1.50"))
    assert rows[1][1] is None
    assert rows[2][2] is None


def test_checkpoint_truncates_wal(tmp_path):
    db = str(tmp_path / "db")
    con = _connect(db)
    con.sql("CREATE TABLE t (a INT)")
    con.sql("INSERT INTO t VALUES (42)")
    con.sql("CHECKPOINT")
    assert not os.path.exists(os.path.join(db, "wal.sql"))
    _crash()
    con2 = _connect(db)
    assert con2.sql("SELECT a FROM t").rows() == [(42,)]


def test_checkpoint_plus_wal(tmp_path):
    db = str(tmp_path / "db")
    con = _connect(db)
    con.sql("CREATE TABLE t (a INT)")
    con.sql("INSERT INTO t VALUES (1)")
    con.sql("CHECKPOINT")
    con.sql("INSERT INTO t VALUES (2)")
    _crash()
    con2 = _connect(db)
    assert con2.sql("SELECT count(*) FROM t").rows() == [(2,)]


def test_views_persist(tmp_path):
    db = str(tmp_path / "db")
    con = _connect(db)
    con.sql("CREATE TABLE t (a INT)")
    con.sql("INSERT INTO t VALUES (5)")
    con.sql("CREATE VIEW v AS SELECT a*2 AS a2 FROM t")
    con.sql("CHECKPOINT")
    _crash()
    con2 = _connect(db)
    assert con2.sql("SELECT a2 FROM v").rows() == [(10,)]


def test_rollback(tmp_path):
    con = _connect(":memory:")
    con.sql("CREATE TABLE t (a INT)")
    con.sql("INSERT INTO t VALUES (1)")
    con.sql("BEGIN")
    con.sql("DROP TABLE t")
    con.sql("ROLLBACK")
    assert con.sql("SELECT count(*) FROM t").rows() == [(1,)]


def test_commit_without_begin_errors():
    con = _connect(":memory:")
    with pytest.raises(Exception, match="no transaction is active"):
        con.sql("COMMIT")


def test_system_functions():
    con = _connect(":memory:")
    con.sql("CREATE TABLE t1 (a INT, b VARCHAR)")
    assert con.sql("SELECT name FROM duckdb_tables()").rows() == [("t1",)]
    cols = con.sql("SELECT column_name, data_type FROM duckdb_columns()").rows()
    assert ("a", "INTEGER") in cols
    assert con.sql(
        "SELECT count(*) > 5 FROM duckdb_settings()").rows() == [(True,)]


def test_explain_analyze():
    con = _connect(":memory:")
    con.sql("CREATE TABLE t (a INT)")
    con.sql("INSERT INTO t VALUES (1),(2),(3)")
    res = con.sql("EXPLAIN ANALYZE SELECT sum(a) FROM t WHERE a > 1")
    text = res.rows()[0][0]
    assert "Query Profiling Result" in text
    assert "ms" in text
    assert con.last_profile is not None


def test_settings_set_reset():
    con = _connect(":memory:")
    con.sql("SET enable_profiling = true")
    assert con.settings.get("enable_profiling") is True
    con.sql("SET threads = 4")
    assert con.settings.get("threads") == 4
    with pytest.raises(Exception):
        con.sql("SET not_a_real_setting = 1")


def test_rollback_undoes_dml():
    """ROLLBACK must undo INSERT/UPDATE/DELETE, not only DDL (reference:
    snapshot isolation via UndoBuffer, src/transaction/undo_buffer.cpp)."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a INT, b VARCHAR)")
    con.sql("INSERT INTO t VALUES (1,'x'),(2,'y')")
    con.sql("BEGIN")
    con.sql("INSERT INTO t VALUES (3,'z')")
    con.sql("UPDATE t SET b = 'updated' WHERE a = 1")
    con.sql("DELETE FROM t WHERE a = 2")
    assert con.sql("SELECT count(*) FROM t").rows()[0][0] == 2
    con.sql("ROLLBACK")
    rows = con.sql("SELECT a, b FROM t ORDER BY a").rows()
    assert rows == [(1, "x"), (2, "y")]


def test_rollback_commit_dml():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a INT)")
    con.sql("BEGIN")
    con.sql("INSERT INTO t VALUES (1),(2)")
    con.sql("COMMIT")
    assert con.sql("SELECT count(*) FROM t").rows()[0][0] == 2


def test_wal_not_resurrected_after_rollback(tmp_path):
    """Statements inside a rolled-back transaction must NOT be in the WAL
    (reference writes the WAL at commit time, wal_write_state.cpp)."""
    db = str(tmp_path / "db")
    con = _connect(db)
    con.sql("CREATE TABLE t (a INT)")
    con.sql("INSERT INTO t VALUES (1)")
    con.sql("BEGIN")
    con.sql("INSERT INTO t VALUES (99)")
    con.sql("ROLLBACK")
    # crash (no checkpoint): reopen replays WAL
    _crash()
    con2 = _connect(db)
    assert con2.sql("SELECT a FROM t ORDER BY a").rows() == [(1,)]


def test_wal_commit_flushes(tmp_path):
    db = str(tmp_path / "db")
    con = _connect(db)
    con.sql("CREATE TABLE t (a INT)")
    con.sql("BEGIN")
    con.sql("INSERT INTO t VALUES (7)")
    con.sql("COMMIT")
    _crash()
    con2 = _connect(db)
    assert con2.sql("SELECT a FROM t").rows() == [(7,)]


def test_alter_is_wal_logged(tmp_path):
    """ALTER TABLE on a persistent DB must be WAL-logged so post-crash
    replay of subsequent INSERTs sees the post-ALTER schema."""
    db = str(tmp_path / "db")
    con = _connect(db)
    con.sql("CREATE TABLE t (a INT)")
    con.sql("INSERT INTO t VALUES (1)")
    con.sql("ALTER TABLE t ADD COLUMN b VARCHAR")
    con.sql("INSERT INTO t VALUES (2, 'two')")
    _crash()
    con2 = _connect(db)  # crash recovery
    rows = con2.sql("SELECT a, b FROM t ORDER BY a").rows()
    assert rows == [(1, None), (2, "two")]


def test_sequences_persist(tmp_path):
    db = str(tmp_path / "db")
    con = _connect(db)
    con.sql("CREATE SEQUENCE seq START 10")
    assert con.sql("SELECT nextval('seq')").rows()[0][0] == 10
    assert con.sql("SELECT nextval('seq')").rows()[0][0] == 11
    con.close()
    con2 = _connect(db)
    assert con2.sql("SELECT nextval('seq')").rows()[0][0] == 12


def test_csv_decimal_exact(tmp_path):
    """DECIMAL wider than 15 digits must load exactly (no float64 trip)."""
    import duckdb_tpu

    p = str(tmp_path / "d.csv")
    with open(p, "w") as f:
        f.write("a\n12345678901234567.89\n-0.005\n")
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a DECIMAL(19,2))")
    con.sql(f"COPY t FROM '{p}' (HEADER)")
    import decimal

    rows = con.sql("SELECT a FROM t").rows()
    assert rows[0][0] == decimal.Decimal("12345678901234567.89")
    assert rows[1][0] == decimal.Decimal("-0.01")


def test_parse_decimal_text_unit():
    from duckdb_tpu.storage.csv import parse_decimal_text

    assert parse_decimal_text("1.5", 2) == 150
    assert parse_decimal_text("-1.5", 2) == -150
    assert parse_decimal_text("12345678901234567.89", 2) == 1234567890123456789
    assert parse_decimal_text(".5", 1) == 5
    assert parse_decimal_text("3", 2) == 300
    assert parse_decimal_text("0.005", 2) == 1  # round half up
    assert parse_decimal_text("-0.005", 2) == -1
    assert parse_decimal_text("1e2", 1) == 1000


def test_wal_replay_deterministic_expressions(tmp_path):
    """now()/random()/uuid() in WAL-logged statements must replay to the
    exact values the original execution stored (entropy pinning; the
    reference logs typed row images instead, wal_replay.cpp:354)."""
    db = str(tmp_path / "db")
    con = _connect(db)
    con.sql("CREATE TABLE t (ts TIMESTAMP, d DATE, r DOUBLE, u VARCHAR)")
    con.sql("INSERT INTO t VALUES (now(), current_date, random(), uuid())")
    before = con.sql("SELECT * FROM t").rows()
    _crash()
    con2 = _connect(db)
    after = con2.sql("SELECT * FROM t").rows()
    assert after == before


def test_now_not_frozen_by_plan_cache():
    """Repeated `SELECT now()` must not return the first bind's time
    (non-deterministic plans are uncacheable)."""
    import time

    con = _connect(":memory:")
    a = con.sql("SELECT now()").rows()[0][0]
    time.sleep(0.01)
    b = con.sql("SELECT now()").rows()[0][0]
    assert b > a
