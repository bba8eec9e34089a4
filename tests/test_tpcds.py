"""TPC-DS correctness oracle: reference queries vs vendored answers.

The reference ships the 99 query texts (extension/tpcds/dsdgen/queries/)
and expected results (extension/tpcds/dsdgen/answers/sf0.01/) — the same
oracle its own test suite uses (test/sql/tpcds/tpcds_sf0_01.test_slow).
Data comes from the reference binary's dsdgen (CALL dsdgen + EXPORT
DATABASE to csv); the engine loads it through its own schema + COPY path.

The default run covers a representative subset (ROLLUP+grouping(),
correlated EXISTS-in-OR, nested correlated scalar aggregates, multi-CTE
window queries). Set TPCDS_FULL=1 to run all 99.
"""

import decimal as pydec
import math
import os
import subprocess

import pytest

from tests._refbin import REF_BIN as REFBIN  # noqa: E501
DSD = "/root/reference/extension/tpcds/dsdgen"
DATA = os.environ.get("TPCDS_DATA") or os.path.join(
    os.path.dirname(__file__), "..", "data", "tpcds_sf0.01")

# every query passes at sf0.01 (tools/tpcds_explore.py verifies the full
# matrix); the default subset keeps suite runtime bounded while covering
# the feature-heavy shapes
SUBSET = [1, 6, 10, 18, 36, 59, 70, 88]
QUERIES = (list(range(1, 100)) if os.environ.get("TPCDS_FULL")
           else SUBSET)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DSD), reason="reference tpcds tree not mounted")


ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _ensure_data():
    """Generate sf0.01 data with the repo's own standalone dsdgen (links the
    TPC Council's generator core from the reference's vendored tree at build
    time; tools/tpcds_dsdgen/). No reference *binary* needed — the repo is
    self-verifying on any machine where /root/reference is mounted."""
    if os.path.exists(os.path.join(DATA, "load.sql")):
        return
    gen = os.path.join(ROOT, "build", "tpcds_dsdgen", "dsdgen_tbl")
    if not os.path.exists(gen):
        subprocess.run(
            ["bash", os.path.join(ROOT, "tools", "tpcds_dsdgen", "build.sh")],
            check=True, capture_output=True)
    os.makedirs(DATA, exist_ok=True)
    subprocess.run([gen, "0.01", os.path.abspath(DATA)],
                   check=True, capture_output=True)
    subprocess.run(
        ["python", os.path.join(ROOT, "tools", "tpcds_dsdgen",
                                "schema_from_reference.py"),
         os.path.join(DATA, "schema.sql")], check=True, capture_output=True)
    with open(os.path.join(DATA, "load.sql"), "w") as f:
        for dat in sorted(os.listdir(DATA)):
            if dat.endswith(".dat"):
                tbl = dat[:-4]
                f.write(f"COPY {tbl} FROM '{os.path.join(os.path.abspath(DATA), dat)}' "
                        "(FORMAT 'csv', quote '\"', header 0, delimiter '|');\n")


@pytest.fixture(scope="module")
def con():
    _ensure_data()
    import duckdb_tpu

    c = duckdb_tpu.connect()
    for stmt in open(os.path.join(DATA, "schema.sql")).read().split(";"):
        if stmt.strip():
            c.sql(stmt)
    for line in open(os.path.join(DATA, "load.sql")).read().splitlines():
        if line.strip():
            c.sql(line)
    return c


def _cmp_cell(got, want: str, q, r, c):
    if want in ("", "NULL"):
        assert got is None, f"{q} r{r}c{c}: expected NULL, got {got!r}"
        return
    assert got is not None, f"{q} r{r}c{c}: got NULL, expected {want!r}"
    if isinstance(got, bool):
        assert str(got).lower() == want.lower(), f"{q} r{r}c{c}"
        return
    if isinstance(got, float):
        w = float(want)
        if w == 0:
            assert abs(got) < 1e-9, f"{q} r{r}c{c}: {got} != {want}"
        else:
            assert math.isclose(got, w, rel_tol=1e-9), \
                f"{q} r{r}c{c}: {got} != {want}"
        return
    if isinstance(got, (int, pydec.Decimal)):
        assert pydec.Decimal(got) == pydec.Decimal(want), \
            f"{q} r{r}c{c}: {got} != {want}"
        return
    assert str(got) == want, f"{q} r{r}c{c}: {str(got)!r} != {want!r}"


@pytest.mark.parametrize("qnum", QUERIES)
def test_tpcds_query(con, qnum):
    q = f"{qnum:02d}"
    sql = open(os.path.join(DSD, "queries", q + ".sql")).read()
    got_rows = con.sql(sql).rows()
    lines = open(os.path.join(DSD, "answers", "sf0.01",
                              q + ".csv")).read().splitlines()
    want_rows = [ln.split("|") for ln in lines[1:]]
    assert len(got_rows) == len(want_rows), (
        f"{q}: got {len(got_rows)} rows, expected {len(want_rows)}")
    for r, (g, w) in enumerate(zip(got_rows, want_rows)):
        assert len(g) == len(w), f"{q} row {r}: arity {len(g)} vs {len(w)}"
        for c, (gc, wc) in enumerate(zip(g, w)):
            _cmp_cell(gc, wc, q, r, c)
