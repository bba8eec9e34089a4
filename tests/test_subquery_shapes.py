"""FROM-less inner subqueries + uncorrelated EXISTS + struct dot access.

Reference binds every subquery shape (src/planner/binder/query_node/
plan_subquery.cpp, bind_emptytableref.cpp); these shapes used to raise
BindError here. Differential-tested against the reference binary when
present.
"""

import os
import subprocess

import pytest

import duckdb_tpu

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501


@pytest.fixture
def con():
    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE t (x INT)")
    c.sql("INSERT INTO t VALUES (1), (2), (NULL), (4)")
    return c


CASES = [
    ("SELECT * FROM (SELECT 1 a) s WHERE a IN (SELECT 1)", [(1,)]),
    ("SELECT * FROM (SELECT 1 a) s WHERE a IN (SELECT 2)", []),
    ("SELECT 1 WHERE EXISTS (SELECT * FROM range(1))", [(1,)]),
    ("SELECT 1 WHERE EXISTS (SELECT * FROM range(0))", []),
    ("SELECT 1 WHERE NOT EXISTS (SELECT * FROM range(0))", [(1,)]),
    ("SELECT * FROM range(3) t(i) WHERE i IN (SELECT 2)", [(2,)]),
    ("SELECT * FROM range(3) t(i) WHERE i NOT IN (SELECT 1)",
     [(0,), (2,)]),
    # correlated EXISTS over a FROM-less inner select
    ("SELECT * FROM range(3) t(i) WHERE EXISTS (SELECT 1 WHERE i > 1)",
     [(2,)]),
    ("SELECT x FROM t WHERE EXISTS (SELECT * FROM t t2 WHERE t2.x > 3) "
     "ORDER BY x", [(1,), (2,), (4,), (None,)]),
    ("SELECT x FROM t WHERE NOT EXISTS (SELECT * FROM t t2 WHERE "
     "t2.x > 10) ORDER BY x", [(1,), (2,), (4,), (None,)]),
]


@pytest.mark.parametrize("q,exp", CASES)
def test_subquery_shapes(con, q, exp):
    assert con.sql(q).rows() == exp


STRUCT_CASES = [
    ("SELECT {'a':1}.a", [(1,)]),
    ("SELECT {'a':1,'b':'x'}.b", [("x",)]),
    ("SELECT {'a': {'b': 7}}.a.b", [(7,)]),
    ("SELECT ('abc').upper()", [("ABC",)]),
]


@pytest.mark.parametrize("q,exp", STRUCT_CASES)
def test_struct_dot_access(con, q, exp):
    assert con.sql(q).rows() == exp


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
@pytest.mark.parametrize("q", [q for q, _ in CASES])
def test_differential(con, q):
    script = ("CREATE TABLE t (x INT); "
              "INSERT INTO t VALUES (1), (2), (NULL), (4); " + q)
    out = subprocess.run([REF_BIN, "-list", "-noheader", "-c", script],
                         capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    ref = [line for line in out.stdout.strip().splitlines() if line]
    got = []
    for r in con.sql(q).rows():
        got.append("|".join("NULL" if v is None else str(v) for v in r))
    assert got == ref
