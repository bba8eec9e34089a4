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
