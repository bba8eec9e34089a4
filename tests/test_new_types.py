"""TIMESTAMPTZ / BIT / UNION / ARRAY(N) type families (VERDICT r4 item 6).

Reference: src/include/duckdb/common/types.hpp:193-260, bit.cpp,
union_casts.cpp. Differential checks against the reference binary where
rendering matches.
"""

import datetime
import os
import subprocess

import pytest

import duckdb_tpu

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

UTC = datetime.timezone.utc


@pytest.fixture
def con():
    return duckdb_tpu.connect()


def test_timestamptz_parse_and_offset(con):
    r = con.sql("SELECT CAST('2020-01-01 10:00:00+02' AS TIMESTAMPTZ)")
    assert r.rows() == [(datetime.datetime(2020, 1, 1, 8, 0, tzinfo=UTC),)]
    r = con.sql("SELECT TIMESTAMP WITH TIME ZONE '2020-01-01 10:00:00'")
    assert r.rows() == [(datetime.datetime(2020, 1, 1, 10, 0, tzinfo=UTC),)]


def test_timestamptz_casts_and_compare(con):
    assert con.sql(
        "SELECT CAST(CAST('2020-06-01' AS DATE) AS TIMESTAMPTZ)").rows() \
        == [(datetime.datetime(2020, 6, 1, tzinfo=UTC),)]
    assert con.sql(
        "SELECT CAST('2020-01-01 10:00:00+02' AS TIMESTAMPTZ) = "
        "CAST('2020-01-01 08:00:00' AS TIMESTAMP)").rows() == [(True,)]
    assert con.sql(
        "SELECT CAST(CAST('2020-01-02 03:04:05+00' AS TIMESTAMPTZ) "
        "AS VARCHAR)").rows() == [("2020-01-02 03:04:05+00",)]


def test_timestamptz_table_roundtrip(con):
    con.sql("CREATE TABLE tz (t TIMESTAMPTZ)")
    con.sql("INSERT INTO tz VALUES ('2021-03-04 05:06:07+01'), (NULL)")
    assert con.sql("SELECT t FROM tz ORDER BY t").rows() == [
        (datetime.datetime(2021, 3, 4, 4, 6, 7, tzinfo=UTC),), (None,)]


def test_bit_basics(con):
    assert con.sql("SELECT CAST('0101' AS BIT)").rows() == [("0101",)]
    assert con.sql("SELECT BIT '1101'").rows() == [("1101",)]
    assert con.sql("SELECT bit_length(BIT '00110'), "
                   "octet_length(BIT '00110')").rows() == [(5, 1)]
    assert con.sql("SELECT get_bit(BIT '0110', 1), "
                   "set_bit(BIT '0110', 0, 1)").rows() == [(1, "1110")]
    assert con.sql("SELECT bitstring(BIT '101', 6)").rows() == [("000101",)]
    with pytest.raises(Exception, match="BIT"):
        con.sql("SELECT CAST('abc' AS BIT)")


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
@pytest.mark.parametrize("q", [
    "SELECT bit_position(BIT '11', BIT '00110')",
    "SELECT bit_position('010'::BIT, '1110101'::BIT)",
    "SELECT get_bit('0110'::BIT, 2)",
    "SELECT set_bit('0110'::BIT, 2, 0)",
    "SELECT bit_length('00110'::BIT), octet_length('00110'::BIT)",
    "SELECT bitstring('0101011'::BIT, 12)",
])
def test_bit_differential(con, q):
    ref = subprocess.run([REF_BIN, "-list", "-noheader", "-c", q],
                         capture_output=True, text=True, timeout=60)
    assert ref.returncode == 0, ref.stderr
    got = ["|".join("NULL" if v is None else str(v) for v in r)
           for r in con.sql(q).rows()]
    assert got == ref.stdout.strip().splitlines(), q


def test_union_basics(con):
    assert con.sql("SELECT union_value(num := 2)").rows() == [(2,)]
    assert con.sql("SELECT union_tag(union_value(num := 2))").rows() \
        == [("num",)]
    assert con.sql("SELECT union_extract(union_value(s := 'x'), 's')"
                   ).rows() == [("x",)]
    assert con.sql("SELECT union_value(num := 2).num").rows() == [(2,)]


def test_union_table(con):
    con.sql("CREATE TABLE u (v UNION(num INT, str VARCHAR))")
    con.sql("INSERT INTO u VALUES (union_value(num := 1)), "
            "(union_value(str := 'two'))")
    rows = con.sql("SELECT union_tag(v), v FROM u ORDER BY 1").rows()
    assert rows == [("num", 1), ("str", "two")]


def test_array_fixed_size(con):
    assert con.sql("SELECT CAST([1,2,3] AS INT[3])").rows() == [([1, 2, 3],)]
    assert con.sql("SELECT array_value(1, 2, 3)").rows() == [([1, 2, 3],)]
    assert con.sql("SELECT array_value(1,2,3)[2]").rows() == [(2,)]
    assert con.sql("SELECT CAST(CAST([1,2,3] AS INT[3]) AS INT[])"
                   ).rows() == [([1, 2, 3],)]
    with pytest.raises(Exception, match="length"):
        con.sql("SELECT CAST([1,2] AS INT[3])")


def test_array_table(con):
    con.sql("CREATE TABLE a (v DOUBLE[2])")
    con.sql("INSERT INTO a VALUES ([1.5, 2.5]), ([3.0, 4.0])")
    assert con.sql("SELECT v[1] FROM a ORDER BY 1").rows() == \
        [(1.5,), (3.0,)]
