"""Open-ended fuzz sweep: python tools/fuzz.py [n_per_seed] [n_seeds].

Prints every non-typed failure with its full SQL (candidates for
tests/test_fuzz.py regressions). Reference analog: test/fuzzer/duckfuzz.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_tpu.testing.fuzz import run_fuzz  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    total = fails = 0
    for seed in range(seeds):
        ok, rej, failures = run_fuzz(n, seed=seed)
        total += n
        fails += len(failures)
        print(f"seed={seed}: ok={ok} rejected={rej} "
              f"failures={len(failures)}", flush=True)
        for sql, e in failures:
            print(f"  {type(e).__name__}: {e}")
            print(f"  SQL: {sql}")
    print(f"TOTAL: {total} queries, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
