"""Grammar-driven SQL fuzzing (reference analog: test/fuzzer/duckfuzz).

The engine may reject generated queries with typed engine errors but must
never crash or raise bare Python errors. CI runs a deterministic sample;
tools/fuzz.py runs open-ended sweeps. Every crasher found during
development became either a fix or a regression below.
"""

import os
import subprocess

import pytest

from duckdb_tpu.testing.fuzz import SETUP, run_fuzz

from tests._refbin import REF_BIN as REF_BIN  # noqa: E501

N = int(os.environ.get("FUZZ_N", "400"))


@pytest.mark.parametrize("seed", [1, 7, 11])
def test_fuzz_no_crashes(seed):
    ok, rej, failures = run_fuzz(N, seed=seed)
    assert not failures, "\n".join(
        f"{type(e).__name__}: {e}\n  {sql}" for sql, e in failures[:5])
    # the generator must produce a healthy share of VALID queries, or the
    # run fuzzes the parser only
    assert ok >= N * 0.2, f"only {ok}/{N} queries executed"


# Every query here crashed the engine (bare python error) at some point
# during round-5 fuzzing; each is pinned to its typed outcome.
REGRESSIONS_REJECT = [
    # arity holes
    "SELECT repeat('x')",
    "SELECT left('abc')",
    "SELECT atan2(1.0) + 1",
    "SELECT to_base('')",
    "SELECT arg_min(1)",
    # arithmetic over non-numeric operand sets
    "SELECT 'zz' // CAST(1 AS DECIMAL(12,3))",
    "SELECT 'v1' / DATE '2020-06-15'",
    "SELECT 1.9 - DATE '2020-06-15'",
    # string function over non-castable arg
    "SELECT upper(42) FROM range(1)",
    # ungrouped column in HAVING
    "SELECT 1 FROM range(3) t(a) GROUP BY 1 HAVING a > 1",
    # semi/anti build columns out of scope
    "SELECT t2.b FROM range(2) t1(a) SEMI JOIN (SELECT 1 b) t2 "
    "ON t1.a = t2.b",
]

REGRESSIONS_OK = [
    # NULL modifier args propagate NULL
    ("SELECT repeat('k3', NULL)", [(None,)]),
    ("SELECT round(1.5, NULL)", [(None,)]),
    # oversized literals are HUGEINT
    ("SELECT 9223372036854775808", [(9223372036854775808,)]),
    ("SELECT -9223372036854775809 < 0", [(True,)]),
    # non-VARCHAR args cast for string aggs / instr
    ("SELECT string_agg(x) FROM (VALUES (1.5), (2.5)) t(x)", [("1.5,2.5",)]),
    ("SELECT instr('a-2b', -2)", [(2,)]),
    # mixed-type IN subquery coerces
    ("SELECT count(*) FROM (VALUES ('1'), ('z')) t(s) "
     "WHERE TRY_CAST(s AS INT) IN (SELECT 1)", [(1,)]),
    # date ingest of timestamp values
    ("SELECT CAST(DATE '2020-01-01' + INTERVAL (3) DAYS AS DATE)", None),
]


@pytest.mark.parametrize("q", REGRESSIONS_REJECT)
def test_fuzz_regression_rejects_typed(q):
    import duckdb_tpu

    con = duckdb_tpu.connect()
    with pytest.raises(ValueError):
        con.sql(q)


@pytest.mark.parametrize("q,exp", REGRESSIONS_OK)
def test_fuzz_regression_ok(q, exp):
    import duckdb_tpu

    con = duckdb_tpu.connect()
    got = con.sql(q).rows()
    if exp is not None:
        assert got == exp


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference binary")
def test_fuzz_differential_sample():
    """Queries both engines accept must agree (sampled; row-order
    insensitive via ORDER BY).  Mirrors duckfuzz's differential mode."""
    import duckdb_tpu

    from duckdb_tpu.testing.fuzz import SqlFuzzer

    con = duckdb_tpu.connect()
    for stmt in SETUP:
        con.sql(stmt)
    fz = SqlFuzzer(99)
    checked = 0
    i = 0
    while checked < 25 and i < 400:
        i += 1
        sql = fz.query()
        if " ORDER BY 1" not in sql or "hash(" in sql \
                or "LIMIT" in sql or " OVER " in sql:
            continue  # only fully-ordered, engine-stable queries compare
        if sql.index(" ORDER BY 1") < max(sql.find(")"), 0):
            pass  # top-level ORDER BY may still precede a closing paren
        try:
            ours = con.sql(sql).rows()
        except Exception:  # noqa: BLE001 — rejected: skip
            continue
        script = "; ".join(SETUP) + "; " + sql
        ref = subprocess.run([REF_BIN, "-list", "-noheader",
                              "-nullvalue", "__NULL__", "-c", script],
                             capture_output=True, text=True, timeout=120)
        if ref.returncode != 0:
            continue  # reference rejected (type rules differ slightly)
        got = ["|".join("__NULL__" if v is None else _fmt(v) for v in r)
               for r in ours]
        exp = ref.stdout.splitlines()
        if len(got) != len(exp):
            raise AssertionError(f"row count {len(got)} != {len(exp)}\n{sql}")
        for g, e in zip(got, exp):
            _compare_row(g, e, sql)
        checked += 1
    assert checked >= 10, f"only {checked} differential queries compared"


def _fmt(v):
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _compare_row(g, e, sql):
    gp, ep = g.split("|"), e.split("|")
    assert len(gp) == len(ep), sql
    for a, b in zip(gp, ep):
        if a == b:
            continue
        try:
            fa, fb = float(a), float(b)
        except ValueError:
            raise AssertionError(f"{a!r} != {b!r}\n{sql}")
        assert abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb)), \
            f"{a} != {b}\n{sql}"
