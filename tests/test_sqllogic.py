"""Run the vendored sqllogictest scripts through the runner."""

import glob
import os

import pytest

HERE = os.path.dirname(__file__)
SCRIPTS = sorted(glob.glob(os.path.join(HERE, "sqllogic", "*.test")))


@pytest.mark.parametrize("path", SCRIPTS, ids=[os.path.basename(p)
                                               for p in SCRIPTS])
def test_sqllogic_file(path):
    from duckdb_tpu.testing.sqllogic import SqlLogicRunner

    res = SqlLogicRunner().run_file(path)
    assert res.ok, "\n".join(res.errors)
    assert res.passed > 0


def test_sqllogic_load_restart():
    """load + restart directives: a real persistence round trip
    (reference: sqllogic_test_runner.cpp load/restart handling)."""
    from duckdb_tpu.testing.sqllogic import SqlLogicRunner

    res = SqlLogicRunner().run_text("""
load __TEST_DIR__/roundtrip_db

statement ok
CREATE TABLE t (a INTEGER, b VARCHAR)

statement ok
INSERT INTO t VALUES (1, 'one'), (2, 'two')

restart

query IT
SELECT a, b FROM t ORDER BY a
----
1\tone
2\ttwo
""")
    assert res.failed == 0, res.errors
    assert res.passed == 3


def test_sqllogic_hashed_result():
    from duckdb_tpu.testing.sqllogic import SqlLogicRunner

    import hashlib
    vals = [str(v) for v in range(10)]
    digest = hashlib.md5("".join(v + "\n" for v in vals).encode()).hexdigest()
    res = SqlLogicRunner().run_text(f"""
query I rowsort
SELECT * FROM range(10)
----
10 values hashing to {digest}
""")
    assert res.failed == 0, res.errors


def test_sqllogic_skipif_onlyif():
    from duckdb_tpu.testing.sqllogic import SqlLogicRunner

    res = SqlLogicRunner().run_text("""
skipif duckdb
query I
SELECT this_would_fail()
----

onlyif sqlite
query I
SELECT this_would_fail_too()
----

onlyif duckdb
query I
SELECT 42
----
42
""")
    assert res.failed == 0, res.errors
    assert res.passed == 1


def test_sqllogic_concurrentloop():
    from duckdb_tpu.testing.sqllogic import SqlLogicRunner

    res = SqlLogicRunner().run_text("""
statement ok
CREATE TABLE t (a INTEGER)

concurrentloop i 0 4

statement ok
INSERT INTO t VALUES (${i})

endloop

query I
SELECT count(*) FROM t
----
4
""")
    assert res.failed == 0, res.errors


def test_sqllogic_sleep_and_require_env():
    from duckdb_tpu.testing.sqllogic import SqlLogicRunner

    res = SqlLogicRunner().run_text("""
require-env THIS_ENV_VAR_DOES_NOT_EXIST

statement ok
SELECT would_fail_if_run()
""")
    assert res.failed == 0
    assert res.skipped == 1
