"""MVCC snapshot isolation across connections sharing one database.

Parity target: the reference's DuckTransaction/DuckTransactionManager
(/root/reference/src/include/duckdb/transaction/duck_transaction.hpp:31-47,
src/transaction/duck_transaction_manager.cpp) — snapshot reads, invisible
uncommitted writes, read-your-writes, and write-write conflict aborts.
This engine versions at TABLE granularity (copy-on-write column planes;
see api/connection.py _Txn) rather than row-level undo buffers — the
isolation guarantees tested here are the same.
"""

import pytest

import duckdb_tpu
from duckdb_tpu.api.connection import TransactionException


@pytest.fixture
def db():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a INT, b VARCHAR)")
    con.sql("INSERT INTO t VALUES (1,'x'),(2,'y')")
    return con


def test_cursor_shares_database(db):
    cur = db.cursor()
    assert cur.sql("SELECT count(*) FROM t").rows() == [(2,)]
    cur.sql("INSERT INTO t VALUES (3,'z')")
    assert db.sql("SELECT count(*) FROM t").rows() == [(3,)]


def test_uncommitted_writes_invisible(db):
    """No dirty reads: another connection must not see in-txn DML."""
    c2 = db.cursor()
    db.sql("BEGIN")
    db.sql("INSERT INTO t VALUES (3,'z')")
    db.sql("UPDATE t SET b = 'dirty' WHERE a = 1")
    assert db.sql("SELECT count(*) FROM t").rows() == [(3,)]  # own writes
    assert c2.sql("SELECT count(*) FROM t").rows() == [(2,)]
    assert c2.sql("SELECT b FROM t WHERE a = 1").rows() == [("x",)]
    db.sql("COMMIT")
    assert c2.sql("SELECT count(*) FROM t").rows() == [(3,)]
    assert c2.sql("SELECT b FROM t WHERE a = 1").rows() == [("dirty",)]


def test_snapshot_reads(db):
    """A transaction keeps seeing its BEGIN-time snapshot while another
    connection commits (repeatable read)."""
    c2 = db.cursor()
    c2.sql("BEGIN")
    assert c2.sql("SELECT count(*) FROM t").rows() == [(2,)]
    db.sql("INSERT INTO t VALUES (3,'z')")  # auto-commit publish
    assert db.sql("SELECT count(*) FROM t").rows() == [(3,)]
    assert c2.sql("SELECT count(*) FROM t").rows() == [(2,)]  # snapshot
    c2.sql("COMMIT")  # read-only txn commits fine
    assert c2.sql("SELECT count(*) FROM t").rows() == [(3,)]


def test_write_write_conflict_aborts(db):
    """First committer wins; the second writer's COMMIT raises and the
    transaction is rolled back."""
    c2 = db.cursor()
    db.sql("BEGIN")
    c2.sql("BEGIN")
    db.sql("UPDATE t SET b = 'first' WHERE a = 1")
    c2.sql("UPDATE t SET b = 'second' WHERE a = 2")  # same TABLE → conflict
    db.sql("COMMIT")
    with pytest.raises(TransactionException, match="conflict"):
        c2.sql("COMMIT")
    # loser's write is gone; winner's survives
    rows = db.sql("SELECT a, b FROM t ORDER BY a").rows()
    assert rows == [(1, "first"), (2, "y")]
    # loser's connection is usable again
    c2.sql("UPDATE t SET b = 'retry' WHERE a = 2")
    assert db.sql("SELECT b FROM t WHERE a = 2").rows() == [("retry",)]


def test_disjoint_tables_no_conflict(db):
    db.sql("CREATE TABLE u (x INT)")
    c2 = db.cursor()
    db.sql("BEGIN")
    c2.sql("BEGIN")
    db.sql("INSERT INTO t VALUES (3,'z')")
    c2.sql("INSERT INTO u VALUES (42)")
    db.sql("COMMIT")
    c2.sql("COMMIT")  # different table → no conflict
    assert db.sql("SELECT count(*) FROM t").rows() == [(3,)]
    assert db.sql("SELECT x FROM u").rows() == [(42,)]


def test_create_create_conflict(db):
    c2 = db.cursor()
    db.sql("BEGIN")
    c2.sql("BEGIN")
    db.sql("CREATE TABLE fresh (a INT)")
    c2.sql("CREATE TABLE fresh (a INT)")
    db.sql("COMMIT")
    with pytest.raises(TransactionException, match="conflict"):
        c2.sql("COMMIT")


def test_drop_vs_write_conflict(db):
    c2 = db.cursor()
    db.sql("BEGIN")
    c2.sql("BEGIN")
    db.sql("DROP TABLE t")
    c2.sql("INSERT INTO t VALUES (3,'z')")
    db.sql("COMMIT")
    with pytest.raises(TransactionException, match="conflict"):
        c2.sql("COMMIT")
    assert not db.catalog.has_table("t")


def test_read_your_writes_within_txn(db):
    db.sql("BEGIN")
    db.sql("INSERT INTO t VALUES (3,'z')")
    db.sql("UPDATE t SET b = 'w' WHERE a = 3")
    assert db.sql("SELECT b FROM t WHERE a = 3").rows() == [("w",)]
    db.sql("ROLLBACK")
    assert db.sql("SELECT count(*) FROM t").rows() == [(2,)]


def test_failed_statement_is_atomic(db):
    """Auto-commit DML runs in an implicit statement transaction: a failed
    statement publishes nothing (reference: statement-level rollback)."""
    db.sql("CREATE TABLE pk (a INT PRIMARY KEY)")
    db.sql("INSERT INTO pk VALUES (1)")
    with pytest.raises(Exception):
        db.sql("INSERT INTO pk VALUES (2), (2)")  # dup within batch
    assert db.sql("SELECT count(*) FROM pk").rows() == [(1,)]


def test_implicit_and_explicit_interleave(db):
    """Auto-commit writes from one connection conflict-check against an
    open transaction's commit like any other publish."""
    c2 = db.cursor()
    c2.sql("BEGIN")
    c2.sql("UPDATE t SET b = 'txn' WHERE a = 1")
    db.sql("UPDATE t SET b = 'auto' WHERE a = 2")  # publishes immediately
    with pytest.raises(TransactionException, match="conflict"):
        c2.sql("COMMIT")
    assert db.sql("SELECT b FROM t WHERE a = 2").rows() == [("auto",)]
    assert db.sql("SELECT b FROM t WHERE a = 1").rows() == [("x",)]


def test_same_file_connects_share(tmp_path):
    db = str(tmp_path / "shared_db")
    a = duckdb_tpu.connect(db)
    a.sql("CREATE TABLE s (v INT)")
    a.sql("INSERT INTO s VALUES (9)")
    b = duckdb_tpu.connect(db)  # same process, same path → same instance
    assert b.sql("SELECT v FROM s").rows() == [(9,)]
    b.sql("INSERT INTO s VALUES (10)")
    assert a.sql("SELECT count(*) FROM s").rows() == [(2,)]
    a.close()
