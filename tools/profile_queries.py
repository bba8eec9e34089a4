"""Per-query dispatch-count + wall-time profiler (VERDICT r5 item 5).

Counts jitted program launches per TPC-H query by wrapping jax.jit'd
callables, and reports warm wall time. Run on the default JAX device:
  python tools/profile_queries.py q02 q04 ...       # SF from BENCH_SF
"""

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = os.environ.get("BENCH_SF", "1")
DATA = os.path.join(ROOT, "data", f"sf{SF}")
REF_QUERIES = "/root/reference/extension/tpch/dbgen/queries"


def main():
    import jax

    n_calls = {"n": 0}
    orig_jit = jax.jit

    def counting_jit(*a, **k):
        f = orig_jit(*a, **k)

        def wrapper(*aa, **kk):
            n_calls["n"] += 1
            return f(*aa, **kk)

        wrapper.lower = getattr(f, "lower", None)
        return wrapper

    jax.jit = counting_jit

    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.load_tpch(DATA)

    queries = sys.argv[1:] or ["q02", "q04", "q07", "q08", "q12", "q20",
                               "q21"]
    print(f"{'query':>6} {'warm_s':>9} {'dispatches':>10}")
    for q in queries:
        sql = open(os.path.join(REF_QUERIES, f"{q}.sql")).read()
        try:
            for _ in range(3):
                con.sql(sql)  # warmups: plan cache, learned shapes, steady
            times = []
            counts = []
            for _ in range(3):
                n_calls["n"] = 0
                t0 = time.perf_counter()
                con.sql(sql)
                times.append(time.perf_counter() - t0)
                counts.append(n_calls["n"])
            print(f"{q:>6} {statistics.median(times):>9.4f} "
                  f"{min(counts):>10}")
        except Exception as e:  # noqa: BLE001
            print(f"{q:>6} ERROR {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
