"""Batch-3 scalar functions — differential vs the reference binary."""

import math
import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

# queries whose textual output matches the reference exactly
EXACT = [
    "SELECT acosh(2.0), asinh(1.0), atanh(0.5), cot(1.0), signbit(-1.5), signbit(2.0)",
    "SELECT binom(8,3), binom(10,0), binom(10,10)",
    "SELECT to_base(255, 2), to_base(42, 16), to_base(0, 8)",
    "SELECT char_length('abc'), character_length('ab'), bit_length('ab'), "
    "octet_length('abc'::BLOB)",
    "SELECT to_base64('hello'::BLOB)",
    "SELECT sha1('x'), sha256('x'), md5_number('abc')",
    "SELECT nfc_normalize('abc'), strip_accents('café'), url_encode('a b'), url_decode('a%20b')",
    "SELECT bin(5), bin(-3), bin('ab'), to_base(255,2)",
    "SELECT like_escape('a%c', 'a$%c', '$'), ilike_escape('A%C', 'a$%c', '$'), "
    "not_like_escape('abc', 'a%', '$'), not_ilike_escape('ABC', 'a%', '$')",
    "SELECT length_grapheme('héllo'), left_grapheme('héllo', 2), "
    "right_grapheme('héllo', 2), substring_grapheme('héllo', 2, 3)",
    "SELECT damerau_levenshtein('abcde','acbed'), "
    "jaro_similarity('martha','marhta'), jaro_winkler_similarity('martha','marhta')",
    "SELECT overlay('txxxxas' PLACING 'hom' FROM 2 FOR 4)",
    "SELECT regexp_full_match('abc','a.c'), regexp_full_match('abcd','a.c'), regexp_escape('a.b')",
    "SELECT regexp_extract_all('a1b22c','[0-9]+'), regexp_split_to_array('a1b22c','[0-9]+')",
    "SELECT parse_filename('/a/b/c.txt'), parse_dirpath('/a/b/c.txt'), parse_path('/a/b/c.txt')",
    "SELECT epoch_ms(TIMESTAMP '2024-01-01 00:00:01.5'), "
    "epoch_us(TIMESTAMP '2024-01-01 00:00:01.5'), epoch_ns(TIMESTAMP '2024-01-01 00:00:01.5')",
    "SELECT era(DATE '2024-01-01'), era(DATE '0001-01-01'), millennium(DATE '2024-01-01'), "
    "isoyear(DATE '2021-01-01'), weekday(DATE '2024-01-01'), yearweek(DATE '2021-01-01'), "
    "julian(DATE '2024-01-01'), dayofmonth(DATE '2024-01-15')",
    "SELECT date_sub('day', DATE '2024-01-01', DATE '2024-03-01'), "
    "date_sub('hour', TIMESTAMP '2024-01-01 05:00:00', TIMESTAMP '2024-01-01 12:30:00')",
    "SELECT datepart('year', DATE '2024-05-05'), datepart('month', DATE '2024-05-05')",
    "SELECT DATE '2024-01-01' + to_days(3), TIMESTAMP '2024-01-01 00:00:00' + to_hours(2)",
    "SELECT epoch(TIMESTAMP '1970-01-02 00:00:00' + to_minutes(30) + to_seconds(5))",
    "SELECT try_strptime('2024-01-15', '%Y-%m-%d'), try_strptime('garbage', '%Y-%m-%d')",
    "SELECT formatReadableSize(123456), formatReadableDecimalSize(123456), "
    "parse_formatted_bytes('1.5 MB'), parse_formatted_bytes('2 KiB')",
    "SELECT unhex('ff'), unbin('101'), from_hex('0a')",
    "SELECT can_cast_implicitly(1, 2.0)",
    "SELECT constant_or_null(42, 'x'), constant_or_null(42, NULL)",
    "SELECT jaccard('abc','abd')",
]


def _norm(rows):
    out = []
    for r in rows:
        parts = []
        for v in r:
            if v is None:
                parts.append("NULL")
            elif v is True:
                parts.append("true")
            elif v is False:
                parts.append("false")
            elif isinstance(v, bytes):
                parts.append("".join(chr(b) if 32 <= b < 127 and b != 92
                                     else f"\\x{b:02X}" for b in v))
            elif isinstance(v, list):
                parts.append("[" + ", ".join(str(x) for x in v) + "]")
            else:
                parts.append(str(v))
        out.append("|".join(parts))
    return out


@pytest.fixture(scope="module")
def con():
    import duckdb_tpu

    return duckdb_tpu.connect()


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
@pytest.mark.parametrize("q", EXACT)
def test_functions_more_differential(con, q):
    got = _norm(con.sql(q).rows())
    ref_r = subprocess.run([REF_BIN, "-list", "-noheader", "-c", q],
                           capture_output=True, text=True)
    assert ref_r.returncode == 0, ref_r.stderr
    ref = ref_r.stdout.splitlines()
    if got == ref:
        return
    # tolerate float formatting differences
    gp = got[0].split("|")
    rp = ref[0].split("|")
    assert len(gp) == len(rp), f"\ngot: {got}\nref: {ref}"
    for a, b in zip(gp, rp):
        if a == b:
            continue
        fa, fb = float(a), float(b)
        assert abs(fa - fb) <= 1e-9 * max(1.0, abs(fa)), \
            f"\nquery: {q}\ngot: {got}\nref: {ref}"


def test_system_functions(con):
    assert con.sql("SELECT current_database()").rows() == [("memory",)]
    assert con.sql("SELECT current_schema()").rows() == [("main",)]
    assert con.sql("SELECT current_schemas(true)").rows() == [(["main"],)]
    v = con.sql("SELECT version()").rows()[0][0]
    assert v.startswith("v")
    a, b = con.sql("SELECT txid_current(), txid_current()").rows()[0]
    assert isinstance(a, int)
    g = con.sql("SELECT getenv('HOME')").rows()[0][0]
    assert isinstance(g, str)
    u = con.sql("SELECT uuidv7()").rows()[0][0]
    assert len(u) == 36 and u[14] == "7"
    s = con.sql("SELECT current_setting('threads')").rows()[0][0]
    assert isinstance(s, str)
