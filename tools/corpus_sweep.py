"""Sweep the reference sqllogictest corpus for files this engine passes.

Runs every `.test` file under /root/reference/test/sql through the
honest SqlLogicRunner (duckdb_tpu/testing/sqllogic.py) in a subprocess
with a per-file timeout, and reports files that pass fully with a
minimum number of scored queries. Output feeds the CURATED list in
tests/test_reference_corpus.py — files are executed in place from the
reference tree (the sanctioned oracle), never copied.

Usage:
    python tools/corpus_sweep.py [--timeout 60] [--min-queries 3] \
        [--jobs 8] [--dirs aggregate join ...] [--out sweep_results.json]
"""

import argparse
import json
import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor, as_completed

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_TESTS = "/root/reference/test/sql"

_CHILD_SRC = r"""
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from duckdb_tpu.testing.sqllogic import SqlLogicRunner
res = SqlLogicRunner().run_file(sys.argv[1])
print(json.dumps({{"ok": res.ok, "passed": res.passed,
                   "errors": res.errors[:3]}}))
"""


def run_one(path: str, timeout: int):
    try:
        p = subprocess.run(
            [sys.executable, "-c", _CHILD_SRC.format(root=ROOT), path],
            capture_output=True, text=True, timeout=timeout,
            cwd=ROOT)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        if p.returncode == 0 and line.startswith("{"):
            return json.loads(line)
        return {"ok": False, "passed": 0,
                "errors": [(p.stderr or "crash")[-400:]]}
    except subprocess.TimeoutExpired:
        return {"ok": False, "passed": 0, "errors": ["timeout"]}
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "passed": 0, "errors": [repr(e)[:400]]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=60)
    ap.add_argument("--min-queries", type=int, default=3)
    ap.add_argument("--jobs", type=int, default=8)
    ap.add_argument("--dirs", nargs="*", default=None,
                    help="subdirs of test/sql to sweep (default: all)")
    ap.add_argument("--max-kb", type=int, default=64,
                    help="skip files larger than this")
    ap.add_argument("--out", default="sweep_results.json")
    args = ap.parse_args()

    files = []
    roots = ([os.path.join(REF_TESTS, d) for d in args.dirs]
             if args.dirs else [REF_TESTS])
    for r in roots:
        for dirpath, _, names in os.walk(r):
            for n in sorted(names):
                if n.endswith(".test"):
                    p = os.path.join(dirpath, n)
                    if os.path.getsize(p) <= args.max_kb * 1024:
                        files.append(p)
    print(f"sweeping {len(files)} files with {args.jobs} jobs", flush=True)

    passing, failing = [], {}
    with ProcessPoolExecutor(max_workers=args.jobs) as pool:
        futs = {pool.submit(run_one, f, args.timeout): f for f in files}
        done = 0
        for fut in as_completed(futs):
            f = futs[fut]
            rel = os.path.relpath(f, REF_TESTS)
            r = fut.result()
            done += 1
            if r["ok"] and r["passed"] >= args.min_queries:
                passing.append((rel, r["passed"]))
                print(f"PASS {rel} ({r['passed']} queries)", flush=True)
            else:
                failing[rel] = r["errors"][:1]
            if done % 100 == 0:
                print(f"... {done}/{len(files)} "
                      f"({len(passing)} passing)", flush=True)

    passing.sort()
    with open(args.out, "w") as f:
        json.dump({"passing": passing, "failing": failing}, f, indent=1)
    print(f"\n{len(passing)}/{len(files)} files pass; results in {args.out}")


if __name__ == "__main__":
    main()
