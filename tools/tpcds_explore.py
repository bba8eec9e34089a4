"""Run all 99 TPC-DS queries at sf0.01 and report pass/fail vs answers.

Usage: python tools/tpcds_explore.py [first] [last]
"""

import decimal as pydec
import math
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFBIN = "/root/build-duckdb/duckdb"
DSD = "/root/reference/extension/tpcds/dsdgen"
DATA = os.path.join(ROOT, "data", "tpcds_sf0.01")


def ensure_data():
    if os.path.exists(os.path.join(DATA, "load.sql")):
        return
    subprocess.run(
        [REFBIN, "-c",
         f"CALL dsdgen(sf=0.01); EXPORT DATABASE '{DATA}' "
         "(FORMAT csv, DELIMITER '|')"], check=True)


def load(con):
    for line in open(os.path.join(DATA, "schema.sql")).read().split(";"):
        if line.strip():
            con.sql(line)
    for line in open(os.path.join(DATA, "load.sql")).read().splitlines():
        if line.strip():
            con.sql(line)


def cmp_cell(got, want):
    if want in ("", "NULL"):
        return got is None
    if got is None:
        return False
    if isinstance(got, bool):
        return str(got).lower() == want.lower()
    if isinstance(got, float):
        try:
            w = float(want)
        except ValueError:
            return False
        return abs(got) < 1e-9 if w == 0 else math.isclose(
            got, w, rel_tol=1e-9)
    if isinstance(got, (int, pydec.Decimal)):
        try:
            return pydec.Decimal(got) == pydec.Decimal(want)
        except Exception:  # noqa: BLE001
            return False
    return str(got) == want


def main():
    ensure_data()
    import duckdb_tpu

    con = duckdb_tpu.connect()
    load(con)
    first = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    last = int(sys.argv[2]) if len(sys.argv) > 2 else 99
    ok, bad = [], []
    for n in range(first, last + 1):
        q = f"{n:02d}"
        sql = open(os.path.join(DSD, "queries", q + ".sql")).read()
        t0 = time.time()
        try:
            res = con.sql(sql)
            rows = res.rows()
        except Exception as e:  # noqa: BLE001
            bad.append((q, f"ERROR {type(e).__name__}: {str(e)[:90]}"))
            print(f"{q} ERROR {type(e).__name__}: {str(e)[:90]}", flush=True)
            continue
        lines = open(os.path.join(DSD, "answers", "sf0.01",
                                  q + ".csv")).read().splitlines()
        want = [ln.split("|") for ln in lines[1:]]
        if len(rows) != len(want):
            bad.append((q, f"ROWS {len(rows)} vs {len(want)}"))
            print(f"{q} ROWS {len(rows)} vs {len(want)}", flush=True)
            continue
        mism = None
        for r, (g, w) in enumerate(zip(rows, want)):
            if len(g) != len(w):
                mism = f"ARITY r{r} {len(g)} vs {len(w)}"
                break
            for c, (gc, wc) in enumerate(zip(g, w)):
                if not cmp_cell(gc, wc):
                    mism = f"CELL r{r}c{c} {gc!r} vs {wc!r}"
                    break
            if mism:
                break
        if mism:
            bad.append((q, mism))
            print(f"{q} {mism}", flush=True)
        else:
            ok.append(q)
            print(f"{q} OK ({time.time()-t0:.1f}s)", flush=True)
    print(f"\nPASS {len(ok)}/{len(ok)+len(bad)}")
    print("passing:", ",".join(ok))
    for q, m in bad:
        print("FAIL", q, m)


if __name__ == "__main__":
    main()
