"""Benchmark driver: TPC-H Q1 throughput on the default JAX device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's benchmark_runner (1 warmup + 5 timed
runs, /root/reference/benchmark/benchmark_runner.cpp): the warmup run
pays XLA compilation; timed runs measure steady-state execution.
vs_baseline compares rows/s against the measured reference DuckDB
baseline on this machine when available (BASELINE_MEASURED.json),
else null.
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


def ensure_data():
    if os.path.isdir(os.path.join(DATA, "lineitem")):
        return
    gen = os.path.join(ROOT, "build", "tpch_dbgen", "dbgen_tbl")
    if not os.path.exists(gen):
        subprocess.run(["bash", os.path.join(ROOT, "tools/tpch_dbgen/build.sh")],
                       check=True)
    subprocess.run([gen, f"{SF:g}", DATA], check=True,
                   stdout=subprocess.DEVNULL)


def main():
    ensure_data()
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.load_tpch(DATA)
    # warmup: compile + load columns to device
    con.sql(Q1)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        con.sql(Q1)
        times.append(time.perf_counter() - t0)
    t = statistics.median(times)
    rows = LINEITEM_ROWS.get(SF, int(6_001_215 * SF))
    rows_per_s = rows / t

    vs = None
    baseline_path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref = base.get(f"q01_sf{SF:g}_rows_per_s")
        if ref:
            vs = rows_per_s / ref
    print(json.dumps({
        "metric": f"tpch_q1_sf{SF:g}_rows_per_s",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
