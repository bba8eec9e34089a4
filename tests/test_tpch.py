"""TPC-H correctness oracle: all 22 reference queries vs vendored answers.

The reference ships query texts (extension/tpch/dbgen/queries/q*.sql) and
expected results (extension/tpch/dbgen/answers/sf0.01/q*.csv) — the same
oracle its own test suite uses (test/sql/tpch/tpch_sf1.test_slow).
DECIMAL/INT columns compare exactly; DOUBLE columns compare to 1e-9
relative (duckdb's own sqllogictest float comparison tolerance class).
"""

import decimal as pydec
import math
import os
import subprocess

import pytest

REF = "/root/reference/extension/tpch/dbgen"
DATA = os.path.join(os.path.dirname(__file__), "..", "data", "sf0.01")
QUERIES = os.path.join(REF, "queries")
ANSWERS = os.path.join(REF, "answers", "sf0.01")


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(DATA):
        root = os.path.join(os.path.dirname(__file__), "..")
        subprocess.run(["bash", "tools/tpch_dbgen/build.sh"], cwd=root, check=True)
        subprocess.run(["./build/tpch_dbgen/dbgen_tbl", "0.01", "data/sf0.01"],
                       cwd=root, check=True)
    import duckdb_tpu

    c = duckdb_tpu.connect()
    c.load_tpch(DATA)
    return c


def _parse_answer(path):
    with open(path) as f:
        lines = f.read().splitlines()
    header = lines[0].split("|")
    # keep empty lines: a row of all-NULL values renders as "" (e.g. q17 sf0.01)
    rows = [line.split("|") for line in lines[1:]]
    return header, rows


def _cmp_cell(got, want: str, q: str, r: int, c: int):
    if want == "" or want == "NULL":
        assert got is None, f"{q} row {r} col {c}: expected NULL, got {got!r}"
        return
    if got is None:
        assert False, f"{q} row {r} col {c}: got NULL, expected {want!r}"
    if isinstance(got, bool):
        assert str(got).lower() == want.lower()
        return
    if isinstance(got, float):
        w = float(want)
        if w == 0:
            assert abs(got) < 1e-9, f"{q} r{r}c{c}: {got} != {want}"
        else:
            assert math.isclose(got, w, rel_tol=1e-9), f"{q} r{r}c{c}: {got} != {want}"
        return
    if isinstance(got, pydec.Decimal):
        assert got == pydec.Decimal(want), f"{q} r{r}c{c}: {got} != {want}"
        return
    if isinstance(got, int):
        # answers may render integers as 123 or 123.00
        w = pydec.Decimal(want)
        assert pydec.Decimal(got) == w, f"{q} r{r}c{c}: {got} != {want}"
        return
    assert str(got) == want, f"{q} r{r}c{c}: {str(got)!r} != {want!r}"


SUPPORTED = list(range(1, 23))


@pytest.mark.parametrize("qnum", SUPPORTED)
def test_tpch_query(con, qnum):
    q = f"q{qnum:02d}"
    with open(os.path.join(QUERIES, q + ".sql")) as f:
        sql = f.read()
    res = con.sql(sql)
    header, want_rows = _parse_answer(os.path.join(ANSWERS, q + ".csv"))
    got_rows = res.rows()
    assert len(got_rows) == len(want_rows), (
        f"{q}: got {len(got_rows)} rows, expected {len(want_rows)}"
    )
    for r, (g, w) in enumerate(zip(got_rows, want_rows)):
        assert len(g) == len(w), f"{q} row {r}: arity {len(g)} vs {len(w)}"
        for c, (gc, wc) in enumerate(zip(g, w)):
            _cmp_cell(gc, wc, q, r, c)
