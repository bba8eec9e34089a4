"""Sweep the reference sqllogictest corpus: find files that pass UNMODIFIED.

Runs each candidate file through SqlLogicRunner in a subprocess (isolation +
timeout) and prints the passing relative paths. Used to grow
tests/test_reference_corpus.py's CURATED list.

Usage:
  python tools/corpus_sweep.py <area> [...]      # e.g. aggregate join order
  python tools/corpus_sweep.py --file <rel>      # single file, verbose
"""

import json
import os
import subprocess
import sys

REF = "/root/reference/test/sql"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %r)
from duckdb_tpu.testing.sqllogic import SqlLogicRunner
res = SqlLogicRunner().run_file(sys.argv[1])
print(json.dumps({"ok": res.ok, "passed": res.passed, "failed": res.failed,
                  "skipped": res.skipped, "errors": res.errors[:3]}))
""" % (ROOT,)


def try_file(path, timeout=60):
    try:
        p = subprocess.run(
            [sys.executable, "-c", CHILD, path],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"ok": False, "errors": ["timeout"]}
    for line in reversed(p.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    return {"ok": False, "errors": [f"crash rc={p.returncode}",
                                    p.stderr[-300:]]}


def main():
    args = sys.argv[1:]
    if args and args[0] == "--file":
        r = try_file(os.path.join(REF, args[1]), timeout=120)
        print(json.dumps(r, indent=1))
        return
    areas = args or ["aggregate", "join", "order", "filter", "cte"]
    existing = set()
    try:
        sys.path.insert(0, os.path.join(ROOT, "tests"))
        import test_reference_corpus as trc

        existing = set(trc.CURATED)
    except Exception:  # noqa: BLE001
        pass
    good, bad, skipped_files = [], [], []
    for area in areas:
        base = os.path.join(REF, area)
        for dirpath, _, files in os.walk(base):
            for f in sorted(files):
                if not f.endswith(".test"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, f), REF)
                if rel in existing:
                    continue
                if os.path.getsize(os.path.join(dirpath, f)) > 100_000:
                    continue
                r = try_file(os.path.join(dirpath, f))
                # require real passes: a file that only skips proves nothing
                if r.get("ok") and r.get("passed", 0) >= 3:
                    good.append(rel)
                    print(f"PASS {rel} ({r['passed']} records)", flush=True)
                elif r.get("ok"):
                    skipped_files.append(rel)
                else:
                    bad.append(rel)
    print(f"\n== {len(good)} new passing, {len(bad)} failing, "
          f"{len(skipped_files)} skip-only ==")
    for rel in good:
        print(f'    "{rel}",')


if __name__ == "__main__":
    main()
