"""Disk spill tier + out-of-core ORDER BY (storage/spill.py,
execution/chunked.py::_range_partitioned_order).

Reference analog: temp-file spilling under temp_directory
(src/storage/temporary_file_manager.cpp) and external sort
(src/common/sort/). Results under a tiny memory_limit must be
bit-identical to the unconstrained run.
"""

import os

import pytest

import duckdb_tpu

N = 400_000


@pytest.fixture(autouse=True)
def _reset_globals():
    # memory_limit / temp_directory are GLOBAL settings (they configure the
    # process-wide device pool); restore them so xdist-sharing tests are
    # unaffected
    yield
    c = duckdb_tpu.connect()
    c.sql("RESET memory_limit")
    c.sql("RESET temp_directory")


def _mk(con):
    con.sql(f"CREATE TABLE big AS SELECT range AS i, range % 97 AS j, "
            f"'v' || CAST(range % 13 AS VARCHAR) AS s, range * 1.5 AS f "
            f"FROM range({N})")


def test_ooc_order_by_bit_exact(tmp_path):
    con = duckdb_tpu.connect()
    _mk(con)
    ref = con.sql("SELECT i, j, s, f FROM big ORDER BY j, i").fetchall()
    ref_lim = con.sql("SELECT i, j FROM big ORDER BY j DESC, i "
                      "LIMIT 500 OFFSET 3").fetchall()
    con.sql(f"SET temp_directory='{tmp_path}'")
    con.sql("SET memory_limit='6MB'")
    got = con.sql("SELECT i, j, s, f FROM big ORDER BY j, i").fetchall()
    assert got == ref
    got_lim = con.sql("SELECT i, j FROM big ORDER BY j DESC, i "
                      "LIMIT 500 OFFSET 3").fetchall()
    assert got_lim == ref_lim
    # the spill path actually fired
    lg = con.sql("SELECT count(*) FROM duckdb_logs() "
                 "WHERE type='out_of_core' AND message LIKE '%range part%'"
                 ).fetchall()
    assert lg[0][0] >= 1


def test_ooc_order_varchar_leading_key(tmp_path):
    con = duckdb_tpu.connect()
    _mk(con)
    ref = con.sql("SELECT s, i FROM big ORDER BY s, i LIMIT 100").fetchall()
    con.sql(f"SET temp_directory='{tmp_path}'")
    con.sql("SET memory_limit='6MB'")
    got = con.sql("SELECT s, i FROM big ORDER BY s, i LIMIT 100").fetchall()
    assert got == ref


def test_ooc_order_nulls(tmp_path):
    con = duckdb_tpu.connect()
    con.sql(f"CREATE TABLE nn AS SELECT range AS i, "
            f"CASE WHEN range % 5 = 0 THEN NULL ELSE range % 31 END AS k "
            f"FROM range({N})")
    ref_last = con.sql("SELECT i FROM nn ORDER BY k, i").fetchall()
    ref_first = con.sql("SELECT i FROM nn ORDER BY k NULLS FIRST, i"
                        ).fetchall()
    con.sql(f"SET temp_directory='{tmp_path}'")
    con.sql("SET memory_limit='4MB'")
    assert con.sql("SELECT i FROM nn ORDER BY k, i").fetchall() == ref_last
    assert con.sql("SELECT i FROM nn ORDER BY k NULLS FIRST, i"
                   ).fetchall() == ref_first


def test_spill_files_in_temp_directory(tmp_path):
    con = duckdb_tpu.connect()
    _mk(con)
    con.sql(f"SET temp_directory='{tmp_path}'")
    con.sql("SET memory_limit='6MB'")
    res = con.sql("SELECT i FROM big ORDER BY j, i")
    assert res.nrows == N
    # sort output memmaps live under the configured directory
    assert any(d.startswith("duckdb_tpu_") for d in os.listdir(tmp_path))


def test_concat_implicit_cast():
    con = duckdb_tpu.connect()
    assert con.sql("SELECT 'a' || 1").fetchall() == [("a1",)]
    assert con.sql("SELECT 1 || 2").fetchall() == [("12",)]
    assert con.sql("SELECT DATE '1994-01-01' || '!'").fetchall() == [
        ("1994-01-01!",)]
