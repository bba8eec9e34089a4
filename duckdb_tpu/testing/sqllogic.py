"""sqllogictest runner.

The reference's primary harness (~4,600 scripts,
/root/reference/test/sqlite/sqllogic_test_runner.cpp, sqllogic_parser.cpp)
uses the extended SQLite format. This runner implements the load-bearing
directives so the same corpus format drives this engine:

  statement ok | statement error [match]
  query <types> [rowsort|valuesort|nosort] [label]
  ----  (expected rows; empty block = no rows)
  loop/endloop, foreach/endloop substitution
  require <ext>     (skipped unless builtin)
  mode skip / unskip, halt

Values render like the reference: NULL for nulls, 'true'/'false' bools,
floats with duckdb-ish %g-style formatting.
"""

from __future__ import annotations

import decimal as pydec
import math
import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class SqlLogicResult:
    path: str
    passed: int = 0
    failed: int = 0
    skipped: int = 0
    errors: List[str] = field(default_factory=list)

    @property
    def ok(self):
        return self.failed == 0


def _fmt_value(v, typ: str) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if typ == "I":
        if isinstance(v, (int,)):
            return str(v)
        if isinstance(v, pydec.Decimal):
            return str(int(v))
        return str(int(v))
    if typ == "R":
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return f"{f:.3f}"
        return f"{f:.3f}"
    return str(v)


class SqlLogicRunner:
    BUILTIN_REQUIRES = {"tpch", "parquet", "json", "skip_reload", "vector_size",
                        "64bit"}

    def __init__(self, connect=None):
        if connect is None:
            import duckdb_tpu

            connect = duckdb_tpu.connect
        self._connect = connect

    def run_file(self, path: str) -> SqlLogicResult:
        with open(path) as f:
            lines = f.read().splitlines()
        res = SqlLogicResult(path=path)
        con = self._connect()
        self._run_lines(lines, con, res, {})
        return res

    def run_text(self, text: str, name: str = "<inline>") -> SqlLogicResult:
        res = SqlLogicResult(path=name)
        con = self._connect()
        self._run_lines(text.splitlines(), con, res, {})
        return res

    # -- core ----------------------------------------------------------------
    def _run_lines(self, lines, con, res, subs):
        i = 0
        skipping = False
        while i < len(lines):
            raw = lines[i]
            line = self._substitute(raw, subs)
            s = line.strip()
            i += 1
            if not s or s.startswith("#"):
                continue
            tok = s.split()
            head = tok[0]
            if head == "halt":
                return
            if head == "mode":
                if len(tok) > 1 and tok[1] == "skip":
                    skipping = True
                elif len(tok) > 1 and tok[1] == "unskip":
                    skipping = False
                continue
            if head == "require":
                if tok[1] not in self.BUILTIN_REQUIRES:
                    res.skipped += 1
                    return  # whole file requires an unsupported extension
                continue
            if head in ("require-env", "load", "restart", "sleep",
                        "concurrentloop", "endloop" , "hash-threshold"):
                continue
            if head in ("loop", "foreach"):
                block, i = self._collect_block(lines, i)
                if skipping:
                    continue
                if head == "loop":
                    var, lo, hi = tok[1], int(tok[2]), int(tok[3])
                    for v in range(lo, hi):
                        self._run_lines(block, con, res, {**subs, var: str(v)})
                else:
                    var, values = tok[1], tok[2:]
                    for v in values:
                        self._run_lines(block, con, res, {**subs, var: v})
                continue
            if head == "statement":
                expect_err = tok[1] in ("error", "maybe")
                sql, i = self._collect_sql(lines, i)
                match_text, i = self._collect_error_match(lines, i)
                if skipping:
                    continue
                sql = self._substitute(sql, subs)
                try:
                    con.sql(sql)
                    if expect_err and tok[1] == "error":
                        res.failed += 1
                        res.errors.append(
                            f"{res.path}: expected error but succeeded: {sql[:100]}")
                    else:
                        res.passed += 1
                except Exception as e:  # noqa: BLE001
                    if expect_err:
                        if match_text and match_text not in str(e):
                            res.failed += 1
                            res.errors.append(
                                f"{res.path}: error mismatch: {e} !~ {match_text}")
                        else:
                            res.passed += 1
                    else:
                        res.failed += 1
                        res.errors.append(f"{res.path}: {e} on: {sql[:120]}")
                continue
            if head == "query":
                types = tok[1]
                sort_mode = tok[2] if len(tok) > 2 else "nosort"
                sql, i = self._collect_sql(lines, i)
                expected, i = self._collect_expected(lines, i)
                if skipping:
                    continue
                sql = self._substitute(sql, subs)
                try:
                    r = con.sql(sql)
                    got = []
                    for row in r.rows():
                        got.append([_fmt_value(v, types[c] if c < len(types)
                                               else "T")
                                    for c, v in enumerate(row)])
                except Exception as e:  # noqa: BLE001
                    res.failed += 1
                    res.errors.append(f"{res.path}: {e} on: {sql[:120]}")
                    continue
                flat = [c for row in got for c in row]
                if sort_mode == "rowsort":
                    got_rows = sorted("\t".join(r_) for r_ in got)
                    exp_rows = sorted("\t".join(expected[j:j + len(types)])
                                      for j in range(0, len(expected),
                                                     len(types)))
                    ok = got_rows == exp_rows
                elif sort_mode == "valuesort":
                    ok = sorted(flat) == sorted(expected)
                else:
                    ok = flat == expected
                if ok:
                    res.passed += 1
                else:
                    res.failed += 1
                    res.errors.append(
                        f"{res.path}: result mismatch on: {sql[:100]}\n"
                        f"  got:      {flat[:12]}\n"
                        f"  expected: {expected[:12]}")
                continue
            # unknown directive: ignore
        return

    def _substitute(self, text, subs):
        for k, v in subs.items():
            text = text.replace("${" + k + "}", v).replace(f"__{k}__", v)
            text = re.sub(rf"\b{re.escape(k)}\b", v, text) if k in ("i",) else text
        return text

    def _collect_sql(self, lines, i):
        sql = []
        while i < len(lines) and lines[i].strip() not in ("----",) \
                and lines[i].strip() != "":
            if lines[i].strip() == "----":
                break
            sql.append(lines[i])
            i += 1
        return "\n".join(sql), i

    def _collect_expected(self, lines, i):
        # skip blank up to ---- or directly the values
        if i < len(lines) and lines[i].strip() == "----":
            i += 1
        else:
            return [], i
        vals = []
        while i < len(lines) and lines[i].strip() != "":
            vals.extend(lines[i].split("\t"))
            i += 1
        return vals, i

    def _collect_error_match(self, lines, i):
        if i < len(lines) and lines[i].strip() == "----":
            i += 1
            msg = []
            while i < len(lines) and lines[i].strip() != "":
                msg.append(lines[i])
                i += 1
            return "\n".join(msg).replace("<REGEX>:", "").strip(), i
        return None, i

    def _collect_block(self, lines, i):
        depth = 1
        block = []
        while i < len(lines):
            s = lines[i].strip()
            if s.startswith(("loop", "foreach", "concurrentloop")):
                depth += 1
            elif s == "endloop":
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            block.append(lines[i])
            i += 1
        return block, i
