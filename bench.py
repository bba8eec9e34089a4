"""Benchmark driver: TPC-H throughput on the default JAX device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "secondary"}.
Headline = Q1 rows/s (scan+filter+group-aggregate, the reference's own
flagship shape, /root/reference/benchmark/tpch/sf1/q01.benchmark); secondary
metrics cover Q3 (join+agg+topn), Q6 (filter+reduce), Q9 (5-way join+agg).

Protocol mirrors the reference's benchmark_runner (1 warmup + 5 timed
runs, /root/reference/benchmark/benchmark_runner.cpp): the warmup run
pays XLA compilation; timed runs measure steady-state execution.
vs_baseline compares against the measured reference DuckDB baseline on
this machine (BASELINE_MEASURED.json): for the headline, ratio of rows/s;
for secondaries, ratio of reference time to our time (>1 = faster).
"""

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

SF = float(os.environ.get("BENCH_SF", "1"))
DATA = os.path.join(ROOT, "data", f"sf{SF:g}")
LINEITEM_ROWS = {0.01: 60175, 0.1: 600572, 1: 6001215, 10: 59986052}
REF_QUERIES = "/root/reference/extension/tpch/dbgen/queries"
# secondary scale factor: SF1 latencies sit near the tunneled runtime's
# ~30 ms per-query dispatch floor (PERF.md), so SF10 is the
# compute-dominated comparison when data + budget allow
SF2 = float(os.environ.get("BENCH_SF2", "10"))
DATA2 = os.path.join(ROOT, "data", f"sf{SF2:g}")

Q1 = """
SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
  sum(l_extendedprice) AS sum_base_price,
  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
  avg(l_quantity) AS avg_qty, avg(l_extendedprice) AS avg_price,
  avg(l_discount) AS avg_disc, count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= CAST('1998-09-02' AS date)
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

SECONDARY = ["q03", "q05", "q06", "q09", "q10", "q18", "q04", "q07",
             "q12", "q14", "q17", "q19", "q21", "q22", "q08",
             "q11", "q15", "q16", "q20", "q13", "q02"]
# q02 LAST in the SF1 list: its correlated-min spine is the largest
# cold-cache compile storm (r5 measurement: it exhausted the compile
# credit and starved six queries); at the end it can only starve itself.
# q09 LAST in the SF10 list: largest SF10 program compile; if the cache
# is cold the budget guard skips it rather than losing the whole block
SECONDARY_SF2 = ["q01", "q03", "q05", "q06", "q10", "q18", "q07",
                 "q12", "q21", "q09"]


def ensure_data():
    if os.path.isdir(os.path.join(DATA, "lineitem")):
        return
    gen = os.path.join(ROOT, "build", "tpch_dbgen", "dbgen_tbl")
    if not os.path.exists(gen):
        subprocess.run(["bash", os.path.join(ROOT, "tools/tpch_dbgen/build.sh")],
                       check=True)
    subprocess.run([gen, f"{SF:g}", DATA], check=True,
                   stdout=subprocess.DEVNULL)


def timed(con, sql, runs=5, warmups=3):
    # steady state needs THREE runs: run 1 populates the plan cache, run 2
    # learns stage cardinalities (compaction caps, group counts) and
    # re-traces with the learned shapes, run 3 is steady
    wtimes = []
    for _ in range(warmups):
        t0 = time.perf_counter()
        con.sql(sql)
        wtimes.append(time.perf_counter() - t0)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.sql(sql)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    # compile credit: warmup time beyond 3 steady runs is XLA compilation
    # (cold persistent cache), not engine speed — credit it back to the
    # budget so one cold query costs itself, not the whole secondary set
    _credit_compile(max(0.0, sum(wtimes) - 3 * med))
    return med


BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))
# compile-credit cap: bounded so a pathological compile storm still ends
# the run before the driver's own timeout can swallow the headline line
CREDIT_CAP_S = float(os.environ.get("BENCH_CREDIT_CAP_S", "900"))
# the budget clock starts AFTER data generation/loading: a first run on a
# fresh machine pays one-time dbgen cost without starving the measurements
# (data persists in data/ across runs)
_T_START = None
_CREDIT = 0.0


def _credit_compile(secs):
    global _CREDIT, _T_START
    take = min(secs, CREDIT_CAP_S - _CREDIT)
    if take > 0:
        _CREDIT += take
        _T_START += take


def _remaining():
    return BUDGET_S - (time.time() - _T_START)


def _emit_partial(secondary):
    """Persist partial secondaries after every query: a driver timeout
    loses one query, not the whole set (VERDICT r4 item 1)."""
    try:
        with open(os.path.join(ROOT, "BENCH_partial.json"), "w") as f:
            json.dump(secondary, f)
    except OSError:
        pass


def main():
    global _T_START
    ensure_data()
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.load_tpch(DATA)
    _T_START = time.time()

    base = {}
    baseline_path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)

    t1 = timed(con, Q1)
    rows = LINEITEM_ROWS.get(SF, int(6_001_215 * SF))
    rows_per_s = rows / t1
    ref = base.get(f"q01_sf{SF:g}_rows_per_s")
    vs = rows_per_s / ref if ref else None

    secondary = {f"q01_sf{SF:g}_s": round(t1, 4)}
    for q in SECONDARY:
        path = os.path.join(REF_QUERIES, f"{q}.sql")
        if not os.path.exists(path):
            continue
        if _remaining() < 45:
            # out of wall budget: report partial results rather than risk the
            # driver's timeout swallowing the headline JSON line
            secondary[f"{q}_sf{SF:g}_skipped"] = "budget"
            continue
        try:
            t = timed(con, open(path).read(), runs=2, warmups=2)
        except Exception as e:  # noqa: BLE001
            secondary[f"{q}_sf{SF:g}_error"] = type(e).__name__
            continue
        secondary[f"{q}_sf{SF:g}_s"] = round(t, 4)
        rt = base.get(f"{q}_sf{SF:g}_s")
        if rt:
            secondary[f"{q}_sf{SF:g}_vs_baseline"] = round(rt / t, 3)
        _emit_partial(secondary)

    # compute-dominated comparison at SF10: SF1 latencies sit near the
    # tunneled runtime's ~30 ms dispatch floor, so SF10 is the number that
    # measures the engine rather than the RTT (PERF.md). The SF10 load is
    # excluded from the budget like the SF1 load above.
    if SF2 != SF and os.path.isdir(os.path.join(DATA2, "lineitem")):
        spent = time.time() - _T_START
        con2 = duckdb_tpu.connect()
        con2.load_tpch(DATA2)
        _T_START = time.time() - spent  # don't charge the data load
        for q in SECONDARY_SF2:
            path = os.path.join(REF_QUERIES, f"{q}.sql")
            if not os.path.exists(path):
                continue
            if _remaining() < 45:
                secondary[f"{q}_sf{SF2:g}_skipped"] = "budget"
                continue
            try:
                t = timed(con2, open(path).read(), runs=2, warmups=2)
            except Exception as e:  # noqa: BLE001
                secondary[f"{q}_sf{SF2:g}_error"] = type(e).__name__
                continue
            secondary[f"{q}_sf{SF2:g}_s"] = round(t, 4)
            rt = base.get(f"{q}_sf{SF2:g}_s")
            if rt:
                secondary[f"{q}_sf{SF2:g}_vs_baseline"] = round(rt / t, 3)
            _emit_partial(secondary)

    print(json.dumps({
        "metric": f"tpch_q1_sf{SF:g}_rows_per_s",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "secondary": secondary,
    }))


if __name__ == "__main__":
    main()
