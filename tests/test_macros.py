"""CREATE MACRO: scalar + table macros expanded at bind time.

Reference: src/function/scalar_macro_function.cpp (MacroFunction::Bind
substitutes argument parse trees), src/function/table_macro_function.cpp,
test/sql/function/generic/test_macros.test.
"""

import os
import subprocess

import pytest

import duckdb_tpu

from tests._refbin import REF_BIN as REF  # noqa: E501


@pytest.fixture
def con():
    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE t (x INT, y INT)")
    c.sql("INSERT INTO t VALUES (1, 10), (2, 20), (3, 30)")
    return c


def test_scalar_macro(con):
    con.sql("CREATE MACRO add(a, b) AS a + b")
    assert con.sql("SELECT add(1, 2)").rows() == [(3,)]
    assert con.sql("SELECT add(x, y) FROM t ORDER BY x").rows() == \
        [(11,), (22,), (33,)]


def test_macro_case_body(con):
    con.sql("CREATE MACRO ifelse(a, b, c) AS CASE WHEN a THEN b ELSE c END")
    assert con.sql("SELECT ifelse(1 < 2, 'y', 'n')").rows() == [("y",)]


def test_default_parameters(con):
    con.sql("CREATE MACRO add_default(a, b := 5) AS a + b")
    assert con.sql("SELECT add_default(37)").rows() == [(42,)]
    assert con.sql("SELECT add_default(37, b := 100)").rows() == [(137,)]
    with pytest.raises(Exception, match="unknown named argument"):
        con.sql("SELECT add_default(1, c := 2)")


def test_macro_with_aggregate(con):
    con.sql("CREATE MACRO sumxy() AS sum(x + y)")
    assert con.sql("SELECT sumxy() FROM t").rows() == [(66,)]
    # also inside GROUP BY queries and HAVING
    rows = con.sql("SELECT x, sumxy() FROM t GROUP BY x "
                   "HAVING sumxy() > 15 ORDER BY x").rows()
    assert rows == [(2, 22), (3, 33)]


def test_nested_macro(con):
    con.sql("CREATE MACRO add(a, b) AS a + b")
    con.sql("CREATE MACRO twice(v) AS add(v, v)")
    assert con.sql("SELECT twice(x) FROM t ORDER BY x").rows() == \
        [(2,), (4,), (6,)]


def test_macro_inside_view(con):
    con.sql("CREATE MACRO double_it(v) AS 2 * v")
    con.sql("CREATE VIEW v AS SELECT double_it(x) AS dx FROM t")
    assert con.sql("SELECT max(dx) FROM v").rows() == [(6,)]


def test_table_macro(con):
    con.sql("CREATE MACRO topx(n) AS TABLE "
            "SELECT x FROM t ORDER BY x DESC LIMIT n")
    assert con.sql("SELECT * FROM topx(2)").rows() == [(3,), (2,)]
    # aliased + joined
    rows = con.sql("SELECT a.x FROM topx(1) a").rows()
    assert rows == [(3,)]


def test_recursive_macro_errors(con):
    con.sql("CREATE MACRO rec(v) AS rec(v)")
    with pytest.raises(Exception, match="depth limit"):
        con.sql("SELECT rec(1)")


def test_drop_and_replace(con):
    con.sql("CREATE MACRO m(a) AS a + 1")
    with pytest.raises(Exception, match="already exists"):
        con.sql("CREATE MACRO m(a) AS a + 2")
    con.sql("CREATE OR REPLACE MACRO m(a) AS a + 2")
    assert con.sql("SELECT m(1)").rows() == [(3,)]
    con.sql("DROP MACRO m")
    with pytest.raises(Exception, match="does not exist"):
        con.sql("SELECT m(1)")
    with pytest.raises(Exception, match="does not exist"):
        con.sql("DROP MACRO m")
    con.sql("DROP MACRO IF EXISTS m")


def test_macro_persistence(tmp_path):
    from duckdb_tpu.api.connection import _OPEN_DBS

    db = str(tmp_path / "db")
    con = duckdb_tpu.connect(db)
    con.sql("CREATE MACRO plus2(a) AS a + 2")
    con.sql("CREATE MACRO nums(n) AS TABLE SELECT * FROM range(n)")
    con.sql("CHECKPOINT")
    _OPEN_DBS.clear()
    con2 = duckdb_tpu.connect(db)
    assert con2.sql("SELECT plus2(40)").rows() == [(42,)]
    assert len(con2.sql("SELECT * FROM nums(3)").rows()) == 3


@pytest.mark.skipif(not os.path.exists(REF), reason="no reference binary")
def test_differential_vs_reference(con):
    """Same macro program on the reference binary must agree."""
    sql = ("CREATE MACRO weighted(a, b, w := 2) AS a + w * b; "
           "SELECT weighted(1, 2), weighted(1, 2, w := 10);")
    ref = subprocess.run([REF, "-list", "-noheader", "-c", sql],
                         capture_output=True, text=True)
    ours = con.sql("CREATE MACRO weighted(a, b, w := 2) AS a + w * b")
    rows = con.sql("SELECT weighted(1, 2), weighted(1, 2, w := 10)").rows()
    got = "|".join(str(v) for v in rows[0])
    assert ref.returncode == 0 and ref.stdout.strip() == got
