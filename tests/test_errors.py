"""Typed error taxonomy + semantic-edge parity with the reference.

Reference: /root/reference/src/common/exception.cpp (error classes and
their rendered prefixes) and the overflow-checked operators in
src/common/operator/. Expected literals below were verified against
/root/build-duckdb/duckdb directly.
"""

import math

import pytest


@pytest.fixture()
def con():
    import duckdb_tpu

    return duckdb_tpu.connect()


def test_division_by_zero_semantics(con):
    # `/` is double division: x/0 → ±inf, 0/0 → nan (never a host error)
    assert con.sql("SELECT 1/0").rows() == [(math.inf,)]
    assert con.sql("SELECT -1/0").rows() == [(-math.inf,)]
    assert math.isnan(con.sql("SELECT 0/0").rows()[0][0])
    assert con.sql("SELECT 1.5/0").rows() == [(math.inf,)]
    # integer // and % by zero → NULL
    assert con.sql("SELECT 1//0").rows() == [(None,)]
    assert con.sql("SELECT 1%0").rows() == [(None,)]


def test_division_by_zero_runtime_columns(con):
    rows = con.sql(
        "SELECT x // y, x % y, x / y FROM (VALUES (10, 3), (10, 0)) t(x, y)"
        " ORDER BY y DESC").rows()
    assert rows[0] == (3, 1, 10 / 3)
    assert rows[1][0] is None and rows[1][1] is None
    assert rows[1][2] == math.inf


def test_int64_overflow_typed_errors(con):
    from duckdb_tpu.errors import OutOfRangeException

    for sql, opname in [
        ("SELECT 9223372036854775807 * 2", "multiplication"),
        ("SELECT 9223372036854775807 + 1", "addition"),
        ("SELECT -9223372036854775807 - 2", "subtraction"),
    ]:
        with pytest.raises(OutOfRangeException,
                           match=f"Overflow in {opname} of INT64"):
            con.sql(sql)


def test_cast_out_of_range_typed(con):
    from duckdb_tpu.errors import ConversionException

    with pytest.raises(ConversionException, match="out of range"):
        con.sql("SELECT CAST(1e20 AS BIGINT)")
    assert con.sql("SELECT TRY_CAST(1e20 AS BIGINT)").rows() == [(None,)]


def test_nested_casts(con):
    assert con.sql("SELECT CAST('[1,2]' AS INT[])").rows() == [([1, 2],)]
    assert con.sql("SELECT CAST('[]' AS INT[])").rows() == [([],)]
    assert con.sql("SELECT CAST('[''a'', ''b'']' AS VARCHAR[])").rows() \
        == [(["a", "b"],)]
    assert con.sql("SELECT CAST('{\"a\": 1}' AS STRUCT(a INT))").rows() \
        == [({"a": 1},)]
    assert con.sql("SELECT CAST('[[1],[2,3]]' AS INT[][])").rows() \
        == [([(1,), (2, 3)],)]
    assert con.sql("SELECT TRY_CAST('zz' AS INT[])").rows() == [(None,)]
    assert con.sql("SELECT CAST('[1,2]' AS INT[])[2]").rows() == [(2,)]


def test_nested_cast_column(con):
    con.sql("CREATE TABLE t (s VARCHAR)")
    con.sql("INSERT INTO t VALUES ('[1,2]'), ('[3]'), (NULL)")
    rows = con.sql("SELECT CAST(s AS INT[]) FROM t").rows()
    assert rows == [([1, 2],), ([3],), (None,)]


def test_error_prefixes_match_reference():
    from duckdb_tpu.errors import (ConversionException, OutOfRangeException,
                                   InvalidInputException)

    assert str(OutOfRangeException("boom")).startswith("Out of Range Error:")
    assert str(ConversionException("boom")).startswith("Conversion Error:")
    assert str(InvalidInputException("boom")).startswith(
        "Invalid Input Error:")
