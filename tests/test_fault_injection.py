"""Fault injection: checkpoint aborts + forced commit failures.

Reference analog: debug_checkpoint_abort / debug-only commit hooks in
/root/reference/src/common/settings.json, exercised by
test/sql/storage/ crash-consistency tests. Every abort point must leave
a database that reopens to exactly the pre-crash committed state.
"""

import os

import pytest


def _fresh(tmp_path, name):
    return str(tmp_path / name)



def _crash(con):
    """Simulate a process crash: drop the connection without close()
    (close would checkpoint); detach from the in-process registry so the
    next open replays from disk."""
    from duckdb_tpu.api import connection as C

    C._OPEN_DBS.pop(C._abspath(con.database), None)

def _open(path):
    import duckdb_tpu

    return duckdb_tpu.connect(path)


@pytest.mark.parametrize("point", ["before_data", "before_header",
                                   "before_truncate"])
def test_checkpoint_abort_recovers(tmp_path, point):
    db = _fresh(tmp_path, f"db_{point}")
    con = _open(db)
    con.sql("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    con.sql("CHECKPOINT")
    con.sql("INSERT INTO t VALUES (3, 'c')")
    con.sql(f"SET debug_checkpoint_abort = '{point}'")
    with pytest.raises(Exception, match="checkpoint aborted"):
        con.sql("CHECKPOINT")
    _crash(con)
    # reopen: all three committed rows must be there exactly once
    con2 = _open(db)
    assert con2.sql("SELECT i, s FROM t ORDER BY i").rows() == [
        (1, "a"), (2, "b"), (3, "c")]
    con2.close()


def test_checkpoint_abort_then_more_writes(tmp_path):
    """Writes after a failed checkpoint must still land exactly once."""
    db = _fresh(tmp_path, "db_after")
    con = _open(db)
    con.sql("CREATE TABLE t (i BIGINT)")
    con.sql("INSERT INTO t VALUES (1)")
    con.sql("SET debug_checkpoint_abort = 'before_truncate'")
    with pytest.raises(Exception, match="checkpoint aborted"):
        con.sql("CHECKPOINT")
    con.sql("RESET debug_checkpoint_abort")
    con.sql("INSERT INTO t VALUES (2)")
    con.close()
    con2 = _open(db)
    assert con2.sql("SELECT sum(i), count(*) FROM t").rows() == [(3, 2)]
    con2.close()


def test_wal_epoch_no_double_apply(tmp_path):
    """The exact crash window the WAL epoch exists for: catalog header
    replaced, WAL not yet truncated → replay must skip folded entries."""
    db = _fresh(tmp_path, "db_epoch")
    con = _open(db)
    con.sql("CREATE TABLE t (i BIGINT)")
    con.sql("INSERT INTO t VALUES (10)")
    con.sql("INSERT INTO t VALUES (20)")
    con.sql("SET debug_checkpoint_abort = 'before_truncate'")
    with pytest.raises(Exception, match="checkpoint aborted"):
        con.sql("CHECKPOINT")
    _crash(con)
    # wal.sql still holds the INSERTs; catalog.json already contains them
    assert os.path.exists(os.path.join(db, "wal.sql"))
    con2 = _open(db)
    assert con2.sql("SELECT sum(i), count(*) FROM t").rows() == [(30, 2)]
    con2.close()


@pytest.mark.parametrize("point", ["before_data", "before_header",
                                   "before_truncate"])
def test_checkpoint_abort_with_deletes_updates(tmp_path, point):
    """DELETE/UPDATE between checkpoints, then a crashed checkpoint: the
    advisor's round-3 repro — in-place data writes before the header swap
    made WAL replay apply deletes against already-updated files (boolean
    index size mismatch). Generation-staged data writes fix it."""
    db = _fresh(tmp_path, f"db_dml_{point}")
    con = _open(db)
    con.sql("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.sql("INSERT INTO t VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d'), (5,'e')")
    con.sql("CHECKPOINT")
    con.sql("DELETE FROM t WHERE i IN (2, 4)")
    con.sql("UPDATE t SET s = 'z' WHERE i = 5")
    con.sql(f"SET debug_checkpoint_abort = '{point}'")
    with pytest.raises(Exception, match="checkpoint aborted"):
        con.sql("CHECKPOINT")
    _crash(con)
    con2 = _open(db)
    assert con2.sql("SELECT i, s FROM t ORDER BY i").rows() == [
        (1, "a"), (3, "c"), (5, "z")]
    # and the database stays writable + re-checkpointable after recovery
    con2.sql("DELETE FROM t WHERE i = 1")
    con2.sql("CHECKPOINT")
    con2.close()
    con3 = _open(db)
    assert con3.sql("SELECT i, s FROM t ORDER BY i").rows() == [
        (3, "c"), (5, "z")]
    con3.close()


def test_checkpoint_generation_cleanup(tmp_path):
    """Successive checkpoints must not accumulate generation dirs."""
    import glob

    db = _fresh(tmp_path, "db_gens")
    con = _open(db)
    con.sql("CREATE TABLE t (i BIGINT)")
    for k in range(3):
        con.sql(f"INSERT INTO t VALUES ({k})")
        con.sql("CHECKPOINT")
    gens = glob.glob(os.path.join(db, "data*"))
    assert len(gens) == 1, gens
    con.close()
    con2 = _open(db)
    assert con2.sql("SELECT count(*) FROM t").rows() == [(3,)]
    con2.close()


def test_forced_commit_failure_rolls_back(tmp_path):
    db = _fresh(tmp_path, "db_commit")
    con = _open(db)
    con.sql("CREATE TABLE t (i BIGINT)")
    con.sql("INSERT INTO t VALUES (1)")
    con.sql("SET debug_force_commit_failure = true")
    con.sql("BEGIN")
    con.sql("INSERT INTO t VALUES (99)")
    with pytest.raises(Exception, match="forced commit failure"):
        con.sql("COMMIT")
    # transaction is gone; nothing published
    assert con.sql("SELECT count(*) FROM t").rows() == [(1,)]
    con.sql("SET debug_force_commit_failure = false")
    con.sql("BEGIN")
    con.sql("INSERT INTO t VALUES (2)")
    con.sql("COMMIT")
    assert con.sql("SELECT sum(i) FROM t").rows() == [(3,)]
    con.close()
    con2 = _open(db)
    assert con2.sql("SELECT sum(i) FROM t").rows() == [(3,)]
    con2.close()
