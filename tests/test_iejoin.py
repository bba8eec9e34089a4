"""IEJoin: inequality-only joins via the sorted-range path.

Reference: src/execution/operator/join/physical_iejoin.cpp (Khayyat et
al.). The TPU shape (executor._ie_join) sorts the build side on the
first inequality, computes each probe row's candidate range with one
searchsorted, and expands at total-candidate length — output-linear for
banded joins where the old fallback was an O(n*m) cross product.
Differential-tested against the reference shell where available.
"""

import os
import subprocess
import time

import pytest

import duckdb_tpu
from tests._refbin import REF_BIN

SETUP = """
CREATE TABLE ev(id INT, s INT, e INT);
INSERT INTO ev VALUES (1, 1, 5), (2, 3, 8), (3, 10, 12), (4, 6, 9),
  (5, 2, 4), (6, NULL, 7), (7, 4, NULL);
CREATE TABLE win(w INT, lo INT, hi INT);
INSERT INTO win VALUES (10, 2, 6), (20, 7, 11), (30, 0, 1), (40, NULL, 5);
"""

QUERIES = [
    "SELECT id, w FROM ev, win WHERE s < hi AND e > lo ORDER BY id, w",
    "SELECT id, w FROM ev JOIN win ON s <= hi AND e >= lo ORDER BY id, w",
    "SELECT count(*) FROM ev a, ev b WHERE a.s < b.s AND a.e > b.e",
    "SELECT a.id, b.id FROM ev a JOIN ev b ON a.s < b.s AND a.e > b.e "
    "ORDER BY 1, 2",
    "SELECT id, w FROM ev LEFT JOIN win ON s < lo AND e > hi ORDER BY 1, 2",
    "SELECT id, w FROM ev FULL JOIN win ON s > lo AND e < hi ORDER BY 1, 2",
    "SELECT id FROM ev SEMI JOIN win ON s < lo ORDER BY 1",
    "SELECT id FROM ev ANTI JOIN win ON s < lo ORDER BY 1",
    "SELECT id, w FROM ev RIGHT JOIN win ON s < lo AND e > hi ORDER BY 1, 2",
    "SELECT id, w FROM ev JOIN win ON s + e < lo * 2 + hi ORDER BY 1, 2",
    "SELECT id, w FROM ev JOIN win ON s > lo ORDER BY 1, 2",
    "SELECT count(*) FROM ev JOIN win ON s >= lo AND s <= hi",
]


def _norm(x):
    return None if x in ("", "NULL", None) else int(x)


def _key(t):
    return tuple((v is None, v) for v in t)


@pytest.fixture(scope="module")
def con():
    c = duckdb_tpu.connect()
    for st in SETUP.strip().split(";"):
        if st.strip():
            c.sql(st)
    return c


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
@pytest.mark.parametrize("q", QUERIES)
def test_iejoin_matches_reference(con, q):
    mine = sorted(
        (tuple(_norm(v) for v in row) for row in con.sql(q).fetchall()),
        key=_key)
    out = subprocess.run(
        [REF_BIN, "-csv", "-noheader", "-nullvalue", "NULL"],
        input=SETUP + "\n" + q + ";", capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    theirs = sorted(
        (tuple(_norm(x) for x in line.split(","))
         for line in out.stdout.strip().splitlines() if line),
        key=_key)
    assert mine == theirs, q


def test_iejoin_floats(con):
    con.sql("CREATE TABLE fa(x DOUBLE); INSERT INTO fa VALUES (1.5), (2.5), "
            "(3.5)")
    con.sql("CREATE TABLE fb(y DOUBLE); INSERT INTO fb VALUES (2.0), (3.0)")
    rows = con.sql("SELECT x, y FROM fa JOIN fb ON x < y ORDER BY 1, 2"
                   ).fetchall()
    assert rows == [(1.5, 2.0), (1.5, 3.0), (2.5, 3.0)]


def test_iejoin_decimal(con):
    con.sql("CREATE TABLE da(x DECIMAL(9,2)); "
            "INSERT INTO da VALUES (1.25), (2.50)")
    con.sql("CREATE TABLE db(y DECIMAL(9,2)); "
            "INSERT INTO db VALUES (2.00), (0.75)")
    rows = con.sql("SELECT CAST(x AS DOUBLE), CAST(y AS DOUBLE) FROM da "
                   "JOIN db ON x > y ORDER BY 1, 2").fetchall()
    assert rows == [(1.25, 0.75), (2.5, 0.75), (2.5, 2.0)]


def test_iejoin_banded_scale():
    """A banded 200k x 200k inequality join (4e10 candidate cross pairs)
    completes because the sorted range prunes to ~output size."""
    c = duckdb_tpu.connect()
    n = 200_000
    c.sql(f"CREATE TABLE big_a AS SELECT range AS i, range * 10 AS s "
          f"FROM range({n})")
    c.sql(f"CREATE TABLE big_b AS SELECT range AS j, range * 10 + 5 AS t "
          f"FROM range({n})")
    t0 = time.time()
    # t in (s, s+10]: exactly one b row per a row => n matches
    rows = c.sql("SELECT count(*) FROM big_a JOIN big_b ON t > s AND "
                 "t <= s + 10").fetchall()
    assert rows[0][0] == n
    assert time.time() - t0 < 120  # cross expansion would need 4e10 pairs


def test_iejoin_interval_band():
    """date > d AND date <= d + INTERVAL: both bounds peel to the same
    build column (monotone interval shift), forming a band range — and
    DATE vs TIMESTAMP comparisons promote units correctly."""
    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE o2(d DATE)")
    c.sql("INSERT INTO o2 VALUES (DATE '1994-01-01'), (DATE '1994-02-01')")
    c.sql("CREATE TABLE l2(s DATE)")
    c.sql("INSERT INTO l2 VALUES (DATE '1994-01-02'), (DATE '1994-01-05'), "
          "(DATE '1994-02-03')")
    rows = c.sql("SELECT s, d FROM l2 JOIN o2 ON s > d AND "
                 "s <= d + INTERVAL 3 DAY ORDER BY 1, 2").fetchall()
    assert [(str(a), str(b)) for a, b in rows] == [
        ("1994-01-02", "1994-01-01"), ("1994-02-03", "1994-02-01")]


def test_date_timestamp_comparison_units():
    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE t0(d DATE, s DATE)")
    c.sql("INSERT INTO t0 VALUES (DATE '1994-01-01', DATE '1994-01-05'), "
          "(DATE '1994-01-01', DATE '1994-01-02')")
    rows = c.sql("SELECT s <= d + INTERVAL 3 DAY FROM t0").fetchall()
    assert [r[0] for r in rows] == [False, True]


def test_iejoin_pair_cap():
    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE ca AS SELECT range AS i FROM range(40000)")
    with pytest.raises(Exception, match="candidate pairs"):
        c.sql("SELECT count(*) FROM ca a JOIN ca b ON a.i < b.i")
