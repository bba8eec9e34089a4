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


NEQ_SETUP = [
    "CREATE TABLE li (ok INT, sk INT, late INT)",
    "INSERT INTO li VALUES (1, 10, 0), (1, 11, 1), (2, 10, 1), "
    "(2, 10, 0), (3, 12, 1), (4, NULL, 1), (4, 13, 0), (5, 14, NULL)",
]

NEQ_CASES = [
    # EXISTS with <> correlation: q21's wait-for-another-supplier shape
    "SELECT ok, sk FROM li l1 WHERE EXISTS (SELECT * FROM li l2 WHERE "
    "l2.ok = l1.ok AND l2.sk <> l1.sk) ORDER BY ok, sk",
    "SELECT ok, sk FROM li l1 WHERE NOT EXISTS (SELECT * FROM li l2 "
    "WHERE l2.ok = l1.ok AND l2.sk <> l1.sk) ORDER BY ok, sk",
    "SELECT ok, sk FROM li l1 WHERE EXISTS (SELECT * FROM li l2 WHERE "
    "l2.ok = l1.ok AND l2.sk <> l1.sk AND l2.late = 1) ORDER BY ok, sk",
    "SELECT count(*) FROM li l1 WHERE late = 1 AND NOT EXISTS "
    "(SELECT * FROM li l3 WHERE l3.ok = l1.ok AND l3.sk <> l1.sk "
    "AND l3.late = 1)",
]


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
@pytest.mark.parametrize("q", NEQ_CASES)
def test_neq_exists_rewrite_differential(q):
    """The <>-correlated EXISTS rewrite (min/max aggregate build) must
    match the reference's MARK-join semantics, including NULL keys."""
    con = duckdb_tpu.connect()
    for stmt in NEQ_SETUP:
        con.sql(stmt)
    script = "; ".join(NEQ_SETUP) + "; " + q
    out = subprocess.run([REF_BIN, "-list", "-noheader", "-c", script],
                         capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    ref = [line for line in out.stdout.strip().splitlines() if line]
    got = ["|".join("NULL" if v is None else str(v) for v in r)
           for r in con.sql(q).rows()]
    assert got == ref, q
