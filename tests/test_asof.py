"""ASOF joins — differential vs the reference binary."""

import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

SETUP = ("CREATE TABLE trades (sym VARCHAR, t INTEGER, px DOUBLE); "
         "CREATE TABLE quotes (sym VARCHAR, t INTEGER, bid DOUBLE); "
         "INSERT INTO trades VALUES ('A',3,100),('A',7,101),('B',2,50),"
         "('B',9,51),('C',4,7); "
         "INSERT INTO quotes VALUES ('A',1,99),('A',5,100.5),('A',6,100.7),"
         "('B',2,49.9),('B',8,50.8);")

QUERIES = [
    "SELECT trades.sym, trades.t, px, bid FROM trades ASOF JOIN quotes "
    "ON trades.sym = quotes.sym AND trades.t >= quotes.t "
    "ORDER BY trades.sym, trades.t",
    "SELECT trades.sym, trades.t, px, bid FROM trades ASOF LEFT JOIN quotes "
    "ON trades.sym = quotes.sym AND trades.t >= quotes.t "
    "ORDER BY trades.sym, trades.t",
    "SELECT trades.sym, trades.t, bid FROM trades ASOF JOIN quotes "
    "ON trades.sym = quotes.sym AND trades.t > quotes.t "
    "ORDER BY trades.sym, trades.t",
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
    return ["|".join("NULL" if v is None else str(v) for v in r)
            for r in rows]


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
@pytest.mark.parametrize("q", QUERIES)
def test_asof_differential(con, q):
    got = _norm(con.sql(q).rows())
    ref = subprocess.run([REF_BIN, "-list", "-noheader", "-c", SETUP + q],
                         capture_output=True, text=True).stdout.splitlines()
    assert got == ref, f"\ngot: {got}\nref: {ref}"
