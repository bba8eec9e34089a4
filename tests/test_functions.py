"""Scalar function library — differential against the reference binary."""

import math
import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

SETUP = ("CREATE TABLE t (s VARCHAR, x DOUBLE, i INTEGER, d DATE); "
         "INSERT INTO t VALUES "
         "('Hello World', 2.5, 10, DATE '2024-03-15'),"
         "('foo,bar,baz', -1.25, 7, DATE '2023-12-31'),"
         "('', 0.0, NULL, DATE '2024-01-01');")

QUERIES = [
    "SELECT ln(x+2), exp(x/10), sqrt(abs(x)) FROM t ORDER BY i NULLS LAST",
    "SELECT sign(x), sign(i) FROM t ORDER BY i NULLS LAST",
    "SELECT greatest(x, 1.0), least(i, 8) FROM t ORDER BY i NULLS LAST",
    "SELECT pow(2, i) FROM t ORDER BY i NULLS LAST",
    "SELECT reverse(s), upper(s), lower(s), length(s) FROM t ORDER BY i NULLS LAST",
    "SELECT left(s, 3), right(s, 3), repeat(s, 2) FROM t ORDER BY i NULLS LAST",
    "SELECT replace(s, 'o', '0') FROM t ORDER BY i NULLS LAST",
    "SELECT split_part(s, ',', 2) FROM t ORDER BY i NULLS LAST",
    "SELECT lpad(s, 15, '*'), rpad(s, 15, '.') FROM t ORDER BY i NULLS LAST",
    "SELECT strpos(s, 'o'), ascii(s) FROM t ORDER BY i NULLS LAST",
    "SELECT contains(s, 'World'), starts_with(s, 'foo') FROM t ORDER BY i NULLS LAST",
    "SELECT regexp_matches(s, '[A-Z]'), regexp_replace(s, '[aeiou]', '_') FROM t ORDER BY i NULLS LAST",
    "SELECT date_trunc('month', d), date_trunc('year', d) FROM t ORDER BY i NULLS LAST",
    "SELECT last_day(d), monthname(d), dayname(d) FROM t ORDER BY i NULLS LAST",
    "SELECT date_diff('day', DATE '2024-01-01', d) FROM t ORDER BY i NULLS LAST",
    "SELECT year(d), month(d), day(d), quarter(d) FROM t ORDER BY i NULLS LAST",
    "SELECT extract(doy FROM d), extract(dow FROM d) FROM t ORDER BY i NULLS LAST",
    "SELECT coalesce(i, -1), nullif(i, 7), ifnull(i, 99) FROM t ORDER BY i NULLS LAST",
    "SELECT if(x > 0, 'pos', 'nonpos') FROM t ORDER BY i NULLS LAST",
    "SELECT floor(x), ceil(x), round(x, 1) FROM t ORDER BY i NULLS LAST",
    "SELECT isnan(x/0 * 0), isfinite(x), isinf(1/(x+0.5)) FROM t ORDER BY i NULLS LAST",
    "SELECT make_date(2024, i, 1) FROM t WHERE i IS NOT NULL ORDER BY i",
    "SELECT epoch(d) FROM t ORDER BY i NULLS LAST",
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
    out = []
    for r in rows:
        cells = []
        for v in r:
            if v is None:
                cells.append("NULL")
            elif isinstance(v, bool):
                cells.append("true" if v else "false")
            elif isinstance(v, float):
                cells.append(f"{v:.10g}")
            else:
                cells.append(str(v))
        out.append("|".join(cells))
    return out


def _norm_ref(lines):
    out = []
    for line in lines:
        cells = []
        for c in line.split("|"):
            try:
                f = float(c)
                if ("." in c or "e" in c or "inf" in c or "nan" in c):
                    cells.append(f"{f:.10g}")
                else:
                    cells.append(c)
            except ValueError:
                cells.append(c)
        out.append("|".join(cells))
    return out


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference duckdb binary not built")
@pytest.mark.parametrize("q", QUERIES)
def test_function_differential(con, q):
    got = _norm(con.sql(q).rows())
    ref_raw = subprocess.run(
        [REF_BIN, "-list", "-noheader", "-c", SETUP + q],
        capture_output=True, text=True,
    )
    assert ref_raw.returncode == 0, ref_raw.stderr
    ref = _norm_ref(ref_raw.stdout.splitlines())
    assert got == ref, f"\ngot: {got}\nref: {ref}"


def test_strftime_strptime():
    """Host-side date formatting; strftime falls back to eager evaluation
    in traced pipelines, strptime is a per-distinct LUT."""
    import datetime
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE sd (dt DATE, s VARCHAR)")
    con.sql("INSERT INTO sd VALUES ('2024-01-15','2024/01/15'),"
            "('2023-06-02','2023/06/02')")
    assert con.sql("SELECT strftime(DATE '2024-01-15', '%Y-%m-%d %a')"
                   ).rows() == [("2024-01-15 Mon",)]
    assert con.sql("SELECT strftime(dt, '%Y/%m') FROM sd ORDER BY dt"
                   ).rows() == [("2023/06",), ("2024/01",)]
    assert con.sql("SELECT strptime(s, '%Y/%m/%d') FROM sd ORDER BY s"
                   ).rows() == [(datetime.datetime(2023, 6, 2),),
                                (datetime.datetime(2024, 1, 15),)]
    # inside a traced filter → eager fallback
    assert con.sql("SELECT count(*) FROM sd WHERE strftime(dt, '%Y') = "
                   "'2024'").rows() == [(1,)]
    # as a group key → general aggregate path
    assert con.sql("SELECT strftime(dt, '%Y') AS y, count(*) FROM sd "
                   "GROUP BY y ORDER BY y").rows() == [("2023", 1),
                                                       ("2024", 1)]


def test_time_type():
    """TIME: micros-since-midnight int64 plane; literals, casts, storage,
    ordering, hour/minute/second extraction (also on TIMESTAMP)."""
    import datetime
    import duckdb_tpu

    con = duckdb_tpu.connect()
    assert con.sql("SELECT TIME '12:34:56.789'").rows() == [
        (datetime.time(12, 34, 56, 789000),)]
    assert con.sql("SELECT '12:00:01'::TIME").rows() == [
        (datetime.time(12, 0, 1),)]
    assert con.sql("SELECT extract(hour FROM TIME '12:34:56'), "
                   "minute(TIME '12:34:56'), second(TIME '12:34:56')"
                   ).rows() == [(12, 34, 56)]
    assert con.sql("SELECT extract(hour FROM TIMESTAMP "
                   "'2024-01-01 07:08:09')").rows() == [(7,)]
    con.sql("CREATE TABLE tt (t TIME)")
    con.sql("INSERT INTO tt VALUES ('01:02:03'), (TIME '23:59:59')")
    assert con.sql("SELECT min(t), max(t) FROM tt").rows() == [
        (datetime.time(1, 2, 3), datetime.time(23, 59, 59))]
    assert con.sql("SELECT TIME '12:00:00' < TIME '13:00:00'"
                   ).rows() == [(True,)]


def test_bar_format_printf():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    assert con.sql("SELECT bar(5, 0, 10, 10)").rows() == [("█████",)]
    assert con.sql("SELECT format('{}-{}', 1, 'a'), printf('%d-%s', 1, 'a')"
                   ).rows() == [("1-a", "1-a")]
    con.sql("CREATE TABLE bf (v INT)")
    con.sql("INSERT INTO bf VALUES (3),(7)")
    assert con.sql("SELECT format('n={}', v) FROM bf ORDER BY v"
                   ).rows() == [("n=3",), ("n=7",)]
