"""Arrow interop: columnar export (zero row loops), streaming record
batches, and direct import (reference: src/common/arrow/, python client
arrow()/fetch_record_batch/from_arrow)."""

import datetime
import decimal

import numpy as np
import pytest

import duckdb_tpu

pa = pytest.importorskip("pyarrow")


def test_arrow_export_types():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t(i INT, b BIGINT, f DOUBLE, s VARCHAR, "
            "d DATE, ts TIMESTAMP, dec DECIMAL(9,2), bo BOOLEAN)")
    con.sql("INSERT INTO t VALUES (1, 10, 1.5, 'a', DATE '2020-01-02', "
            "TIMESTAMP '2020-01-02 03:04:05.123456', 12.34, true), "
            "(NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)")
    tbl = con.sql("SELECT * FROM t ORDER BY i NULLS LAST").arrow()
    assert tbl.num_rows == 2
    row = {k: v[0] for k, v in tbl.to_pydict().items()}
    assert row["i"] == 1 and row["b"] == 10 and row["f"] == 1.5
    assert row["s"] == "a"
    assert row["d"] == datetime.date(2020, 1, 2)
    assert row["ts"] == datetime.datetime(2020, 1, 2, 3, 4, 5, 123456)
    assert row["dec"] == decimal.Decimal("12.34")
    assert row["bo"] is True
    nulls = {k: v[1] for k, v in tbl.to_pydict().items()}
    assert all(v is None for v in nulls.values())
    # dictionary-encoded strings export without row materialization
    assert pa.types.is_dictionary(tbl.schema.field("s").type)


def test_record_batch_reader():
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t AS SELECT range AS i FROM range(2500)")
    reader = con.sql("SELECT i FROM t ORDER BY i").fetch_record_batch(1000)
    batches = list(reader)
    assert [b.num_rows for b in batches] == [1000, 1000, 500]
    assert batches[0].column(0)[0].as_py() == 0
    assert batches[2].column(0)[499].as_py() == 2499


def test_from_arrow_roundtrip():
    con = duckdb_tpu.connect()
    tbl = pa.table({
        "i": pa.array([1, 2, None], pa.int64()),
        "s": pa.array(["x", None, "z"]),
        "f": pa.array([1.0, 2.5, None]),
        "d": pa.array([datetime.date(2020, 1, 1), None,
                       datetime.date(2021, 6, 5)]),
    })
    con.from_arrow(tbl, "at")
    rows = con.sql("SELECT * FROM at ORDER BY i NULLS LAST").fetchall()
    assert rows[0] == (1, "x", 1.0, datetime.date(2020, 1, 1))
    assert rows[1][0] == 2 and rows[1][1] is None
    assert rows[2][0] is None and rows[2][1] == "z"
    # round-trip through arrow again
    back = con.sql("SELECT i, s FROM at ORDER BY i NULLS LAST").arrow()
    assert back.column("i").to_pylist() == [1, 2, None]


def test_from_arrow_dictionary():
    con = duckdb_tpu.connect()
    dic = pa.DictionaryArray.from_arrays(
        pa.array([0, 1, 0, None], pa.int32()), pa.array(["lo", "hi"]))
    con.from_arrow(pa.table({"c": dic}), "dt")
    assert con.sql("SELECT c FROM dt").fetchall() == [
        ("lo",), ("hi",), ("lo",), (None,)]


def test_arrow_big_no_row_loop():
    con = duckdb_tpu.connect()
    n = 1_000_000
    con.sql(f"CREATE TABLE big AS SELECT range AS i, range * 0.5 AS f "
            f"FROM range({n})")
    import time
    t0 = time.time()
    tbl = con.sql("SELECT i, f FROM big").arrow()
    dt = time.time() - t0
    assert tbl.num_rows == n
    assert dt < 10, f"arrow export took {dt:.1f}s — row loop suspected"


def test_arrow_decimal_export_exact():
    """ADVICE r4: decimal export must not inflate by 10^scale."""
    import decimal

    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE d (v DECIMAL(10,2))")
    con.sql("INSERT INTO d VALUES (34.56), (34.56), (NULL), (-1.23)")
    t = con.sql("SELECT sum(v) s, min(v) m FROM d").arrow()
    assert t.column("s")[0].as_py() == decimal.Decimal("67.89")
    assert t.column("m")[0].as_py() == decimal.Decimal("-1.23")
    t2 = con.sql("SELECT v FROM d").arrow()
    assert [x.as_py() for x in t2.column("v")] == [
        decimal.Decimal("34.56"), decimal.Decimal("34.56"), None,
        decimal.Decimal("-1.23")]


def test_arrow_decimal38_and_hugeint_beyond_int64():
    import decimal

    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE w (v DECIMAL(18,2))")
    con.sql("INSERT INTO w SELECT 9999999999999999.99 FROM range(2000)")
    t = con.sql("SELECT sum(v) s FROM w").arrow()
    assert t.column("s")[0].as_py() == \
        decimal.Decimal(999999999999999999 * 2000).scaleb(-2)
    t2 = con.sql("SELECT sum(x) s FROM (VALUES (9223372036854775807),"
                 "(9223372036854775807)) t(x)").arrow()
    assert t2.column("s")[0].as_py() == \
        decimal.Decimal(18446744073709551614)
