"""Window function tests.

Differential against the reference engine when its shell binary is built
(/root/build-duckdb/duckdb — the same oracle strategy as SURVEY §4);
otherwise against vendored expected outputs computed from that oracle.
"""

import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

SETUP = ("CREATE TABLE t (g VARCHAR, x INTEGER); "
         "INSERT INTO t VALUES ('a',1),('a',2),('a',2),('a',5),"
         "('b',10),('b',NULL),('b',3);")

QUERIES = [
    "SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, rank() OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, dense_rank() OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, sum(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, sum(x) OVER (PARTITION BY g) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, avg(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, min(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, max(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, count(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, lag(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, lead(x, 1) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, first_value(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, last_value(x) OVER (PARTITION BY g ORDER BY x) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, sum(x) OVER (PARTITION BY g ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, sum(x) OVER (PARTITION BY g ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) FROM t ORDER BY g, x NULLS LAST",
    "SELECT g, x, row_number() OVER (ORDER BY x DESC NULLS LAST) FROM t ORDER BY g, x NULLS LAST",
]


@pytest.fixture(scope="module")
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    for stmt in SETUP.split(";"):
        if stmt.strip():
            c.sql(stmt)
    return c


def _norm(rows):
    return ["|".join("NULL" if v is None else str(v) for v in r) for r in rows]


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference duckdb binary not built")
@pytest.mark.parametrize("q", QUERIES)
def test_window_differential(con, q):
    got = _norm(con.sql(q).rows())
    ref = subprocess.run(
        [REF_BIN, "-list", "-noheader", "-c", SETUP + q],
        capture_output=True, text=True,
    ).stdout.strip().splitlines()
    assert got == ref, f"\ngot: {got}\nref: {ref}"


class TestExplicitFrames:
    """ROWS/RANGE BETWEEN frames with offsets, differentially verified against
    the reference binary (reference: src/function/window/window_boundaries_
    state.cpp). Expectations below are the reference's own output."""

    @pytest.fixture(scope="class")
    def fcon(self):
        import duckdb_tpu

        con = duckdb_tpu.connect()
        con.sql("CREATE TABLE wt (g INT, k INT, v INT)")
        con.sql("INSERT INTO wt VALUES (1,1,10),(1,2,20),(1,2,25),(1,5,50),"
                "(1,9,90),(2,1,5),(2,3,30),(2,4,NULL),(2,8,80),(1,NULL,7),"
                "(2,NULL,NULL)")
        con.sql("CREATE TABLE wd (g INT, k DECIMAL(8,2), v INT)")
        con.sql("INSERT INTO wd VALUES (1,1.50,10),(1,2.25,20),(1,2.80,25),"
                "(1,5.00,50),(2,0.10,5),(2,3.75,30),(2,NULL,9)")
        con.sql("CREATE TABLE wdt (k DATE, v INT)")
        con.sql("INSERT INTO wdt VALUES ('2024-01-01',1),('2024-01-03',3),"
                "('2024-01-04',4),('2024-01-10',10)")
        return con

    def q(self, fcon, sql):
        return fcon.sql(sql).rows()

    def test_range_sum_offsets(self, fcon):
        rows = self.q(fcon, "SELECT g,k, sum(v) OVER (PARTITION BY g ORDER "
                      "BY k RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) "
                      "FROM wt ORDER BY g,k,v")
        assert [r[2] for r in rows] == [55, 55, 55, 50, 90, 7,
                                        35, 35, 30, 80, None]

    def test_range_min_offsets(self, fcon):
        rows = self.q(fcon, "SELECT g,k, min(v) OVER (PARTITION BY g ORDER "
                      "BY k RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) "
                      "FROM wt ORDER BY g,k,v")
        assert [r[2] for r in rows] == [10, 10, 10, 50, 90, 7,
                                        5, 5, 30, 80, None]

    def test_rows_minmax_sliding(self, fcon):
        rows = self.q(fcon, "SELECT g,k, min(v) OVER (PARTITION BY g ORDER "
                      "BY k ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) "
                      "FROM wt ORDER BY g,k,v")
        assert [r[2] for r in rows] == [10, 10, 10, 20, 25, 7,
                                        5, 5, 5, 30, 80]

    def test_range_desc(self, fcon):
        rows = self.q(fcon, "SELECT g,k, sum(v) OVER (PARTITION BY g ORDER "
                      "BY k DESC RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) "
                      "FROM wt ORDER BY g,k,v")
        assert [r[2] for r in rows] == [55, 55, 55, 50, 90, 7,
                                        35, 35, 30, 80, None]

    def test_range_following_only_empty_frames(self, fcon):
        rows = self.q(fcon, "SELECT g,k, sum(v) OVER (PARTITION BY g ORDER "
                      "BY k RANGE BETWEEN 1 FOLLOWING AND 3 FOLLOWING) "
                      "FROM wt ORDER BY g,k,v")
        assert [r[2] for r in rows] == [45, 50, 50, None, None, 7,
                                        30, None, None, None, None]

    def test_framed_first_last_value(self, fcon):
        rows = self.q(fcon, "SELECT g,k, last_value(v) OVER (PARTITION BY g "
                      "ORDER BY k RANGE BETWEEN 2 PRECEDING AND 1 FOLLOWING) "
                      "FROM wt ORDER BY g,k,v")
        assert [r[2] for r in rows] == [25, 25, 25, 50, 90, 7,
                                        5, None, None, 80, None]

    def test_decimal_range_key(self, fcon):
        rows = self.q(fcon, "SELECT g,k, sum(v) OVER (PARTITION BY g ORDER "
                      "BY k RANGE BETWEEN 1.0 PRECEDING AND 0.55 FOLLOWING) "
                      "FROM wd ORDER BY g,k")
        assert [r[2] for r in rows] == [10, 55, 45, 50, 5, 30, 9]

    def test_date_range_key(self, fcon):
        rows = self.q(fcon, "SELECT k, sum(v) OVER (ORDER BY k RANGE "
                      "BETWEEN 2 PRECEDING AND 1 FOLLOWING) FROM wdt "
                      "ORDER BY k")
        assert [r[1] for r in rows] == [1, 8, 7, 10]

    def test_rows_preceding_only(self, fcon):
        rows = self.q(fcon, "SELECT g,k, sum(v) OVER (PARTITION BY g ORDER "
                      "BY k ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) "
                      "FROM wt ORDER BY g,k,v")
        assert [r[2] for r in rows] == [None, 10, 30, 45, 75, 140,
                                        None, 5, 35, 30, 80]


def test_percent_rank_cume_dist_nth_value(con):
    """Reference-verified distribution functions and nth_value (default
    peer-bounded frame and explicit ROWS frames)."""
    rows = con.sql("SELECT v, percent_rank() OVER (ORDER BY v), "
                   "cume_dist() OVER (ORDER BY v) FROM "
                   "(SELECT unnest([10,20,20,30]) AS v) ORDER BY v").rows()
    assert rows == [(10, 0.0, 0.25), (20, 1 / 3, 0.75), (20, 1 / 3, 0.75),
                    (30, 1.0, 1.0)]
    rows = con.sql("SELECT v, nth_value(v, 2) OVER (ORDER BY v) FROM "
                   "(SELECT unnest([10,20,30]) AS v) ORDER BY v").rows()
    assert rows == [(10, None), (20, 20), (30, 20)]
    rows = con.sql("SELECT v, nth_value(v, 2) OVER (ORDER BY v ROWS "
                   "BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM "
                   "(SELECT unnest([10,20,30]) AS v) ORDER BY v").rows()
    assert rows == [(10, 20), (20, 20), (30, 30)]


def test_holistic_window_aggregates(con):
    """median/stddev/variance over unordered partitions (reference-verified;
    variance may differ in the last ulp — accumulation order)."""
    import math

    rows = con.sql("SELECT g, median(v) OVER (PARTITION BY g) FROM "
                   "(SELECT unnest([1,1,1,2,2]) AS g, "
                   "unnest([10,20,40,5,NULL]) AS v) ORDER BY g, v").rows()
    assert [r[1] for r in rows] == [20.0, 20.0, 20.0, 5.0, 5.0]
    rows = con.sql("SELECT g, stddev(v) OVER (PARTITION BY g) FROM "
                   "(SELECT unnest([1,1,1,2,2]) AS g, "
                   "unnest([10,20,40,5,NULL]) AS v) ORDER BY g, v").rows()
    assert rows[0][1] == 15.275252316519467  # bit-exact vs reference
    assert rows[3][1] is None  # n < 2
    rows = con.sql("SELECT var_pop(v) OVER (PARTITION BY g) FROM "
                   "(SELECT unnest([1,1,1]) AS g, "
                   "unnest([10,20,40]) AS v)").rows()
    assert math.isclose(rows[0][0], 1400 / 9, rel_tol=1e-12)


def test_range_frame_interval_month(con):
    con.sql("CREATE TABLE ev_iv (d DATE, v INT)")
    con.sql("INSERT INTO ev_iv VALUES ('2024-01-15', 1), ('2024-02-10', 2), "
            "('2024-03-05', 4), ('2024-05-01', 8)")
    r = con.sql(
        "SELECT d, sum(v) OVER (ORDER BY d RANGE BETWEEN INTERVAL '1' MONTH "
        "PRECEDING AND CURRENT ROW) FROM ev_iv ORDER BY d").rows()
    assert [x[1] for x in r] == [1, 3, 6, 8]


def test_range_frame_interval_days_both_sides(con):
    con.sql("CREATE TABLE ev_iv2 (d DATE, v INT)")
    con.sql("INSERT INTO ev_iv2 VALUES ('2024-01-15', 1), ('2024-02-10', 2), "
            "('2024-03-05', 4), ('2024-05-01', 8)")
    r = con.sql(
        "SELECT d, sum(v) OVER (ORDER BY d RANGE BETWEEN INTERVAL '30' DAY "
        "PRECEDING AND INTERVAL '30' DAY FOLLOWING) FROM ev_iv2 "
        "ORDER BY d").rows()
    assert [x[1] for x in r] == [3, 7, 6, 8]


def test_bare_interval_literal_select(con):
    import datetime

    r = con.sql("SELECT INTERVAL '2' DAY, INTERVAL '90' SECOND").rows()
    assert r == [(datetime.timedelta(days=2),
                  datetime.timedelta(seconds=90))]
