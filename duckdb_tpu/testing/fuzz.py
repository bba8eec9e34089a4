"""Grammar-driven SQL fuzzer (reference analog: test/fuzzer/duckfuzz).

Generates random-but-valid-shaped SELECT statements over a seed schema
and executes them. The contract: the engine may REJECT a query with a
typed engine error (Parser/Binder/Conversion/NotImplemented/...), but it
must never crash, assert, or raise a bare Python error (TypeError,
KeyError, IndexError, AttributeError) — those are bugs.

Deterministic per seed. Used by tests/test_fuzz.py (CI-sized run) and
tools/fuzz.py (long runs); every crasher found becomes a regression in
tests/test_fuzz_regressions.py.
"""

from __future__ import annotations

import random

# typed engine errors: acceptable rejections
ACCEPTABLE = (
    "ParserError", "BindError", "ConversionException", "BinderException",
    "NotImplementedException", "InvalidInputException", "OutOfRangeException",
    "ConnectionException", "CatalogException", "ConstraintException",
    "SyntaxException", "MacroError", "TransactionException",
    "SerializationException", "Error",
)

INT_COLS = ("a", "b", "g")
STR_COLS = ("s",)
FLOAT_COLS = ("f",)
DATE_COLS = ("d",)
ALL_COLS = INT_COLS + STR_COLS + FLOAT_COLS + DATE_COLS

SETUP = [
    "CREATE TABLE t1 (a INTEGER, b BIGINT, g INTEGER, s VARCHAR, "
    "f DOUBLE, d DATE)",
    "INSERT INTO t1 SELECT range, range * 1000000007 % 97, range % 5, "
    "'v' || (range % 13), range / 7.0, "
    "DATE '2020-01-01' + INTERVAL (range % 900) DAYS FROM range(500)",
    "INSERT INTO t1 VALUES (NULL, NULL, NULL, NULL, NULL, NULL)",
    "CREATE TABLE t2 (a INTEGER, x VARCHAR, y DOUBLE)",
    "INSERT INTO t2 SELECT range * 2, 'k' || (range % 7), range * 1.5 "
    "FROM range(200)",
]

AGGS = ("sum", "min", "max", "avg", "count", "first", "stddev",
        "bool_and", "string_agg", "median", "product", "bit_xor",
        "approx_count_distinct", "arg_min", "var_pop", "entropy")
SCALAR_FNS = ("abs", "length", "upper", "lower", "round", "floor", "sqrt",
              "ln", "reverse", "trim", "md5", "year", "hash", "ascii",
              "sign", "bit_count", "least", "greatest", "coalesce",
              "concat", "left", "right", "repeat", "instr", "strip_accents",
              "damerau_levenshtein", "to_base", "format_bytes", "even",
              "gamma", "cot", "atan2", "list_value", "nullif")
BINOPS = ("+", "-", "*", "/", "%", "//", "||")
CMPS = ("=", "<>", "<", "<=", ">", ">=")


class SqlFuzzer:
    def __init__(self, seed: int):
        self.rng = random.Random(seed)

    def expr(self, depth: int = 0) -> str:
        r = self.rng
        if depth > 3 or r.random() < 0.3:
            return r.choice([
                r.choice(ALL_COLS),
                str(r.randint(-5, 100)),
                f"{r.uniform(-2, 2):.3f}",
                f"'{r.choice(['x', 'v1', 'k3', '', 'zz', '%1%'])}'",
                "NULL",
                "DATE '2020-06-15'",
                str(2 ** 63 - r.randint(0, 2)),
            ])
        kind = r.randint(0, 6)
        if kind == 0:
            return (f"({self.expr(depth + 1)} {r.choice(BINOPS)} "
                    f"{self.expr(depth + 1)})")
        if kind == 1:
            fn = r.choice(SCALAR_FNS)
            nargs = r.randint(1, 2)
            args = ", ".join(self.expr(depth + 1) for _ in range(nargs))
            return f"{fn}({args})"
        if kind == 2:
            return (f"CASE WHEN {self.pred(depth + 1)} THEN "
                    f"{self.expr(depth + 1)} ELSE {self.expr(depth + 1)} END")
        if kind == 3:
            t = r.choice(["INTEGER", "BIGINT", "VARCHAR", "DOUBLE",
                          "DECIMAL(12,3)", "DATE", "HUGEINT"])
            return f"TRY_CAST({self.expr(depth + 1)} AS {t})"
        if kind == 4:
            return f"(SELECT {r.choice(['min(a)', 'max(b)', 'count(*)'])} FROM t2)"
        if kind == 5:
            return f"({self.expr(depth + 1)})"
        return (f"CASE {self.expr(depth + 1)} WHEN {self.expr(depth + 1)} "
                f"THEN {self.expr(depth + 1)} END")

    def pred(self, depth: int = 0) -> str:
        r = self.rng
        if depth > 3 or r.random() < 0.4:
            return (f"{self.expr(depth + 1)} {r.choice(CMPS)} "
                    f"{self.expr(depth + 1)}")
        kind = r.randint(0, 5)
        if kind == 0:
            return f"({self.pred(depth + 1)} AND {self.pred(depth + 1)})"
        if kind == 1:
            return f"({self.pred(depth + 1)} OR {self.pred(depth + 1)})"
        if kind == 2:
            return f"NOT ({self.pred(depth + 1)})"
        if kind == 3:
            return f"{self.expr(depth + 1)} IS {r.choice(['NULL', 'NOT NULL'])}"
        if kind == 4:
            items = ", ".join(self.expr(depth + 1)
                              for _ in range(r.randint(1, 3)))
            return f"{self.expr(depth + 1)} IN ({items})"
        return (f"{r.choice(ALL_COLS)} IN (SELECT {r.choice(['a', 'x'])} "
                f"FROM t2)") if r.random() < 0.5 else \
            (f"EXISTS (SELECT 1 FROM t2 WHERE t2.a = t1.{r.choice(INT_COLS)})")

    def query(self) -> str:
        r = self.rng
        shape = r.randint(0, 4)
        if shape == 0:  # plain projection
            sel = ", ".join(self.expr() for _ in range(r.randint(1, 4)))
            q = f"SELECT {sel} FROM t1"
            if r.random() < 0.7:
                q += f" WHERE {self.pred()}"
        elif shape == 1:  # aggregate
            aggs = ", ".join(
                f"{r.choice(AGGS)}({self.expr()})"
                for _ in range(r.randint(1, 3)))
            q = f"SELECT g, {aggs} FROM t1"
            if r.random() < 0.5:
                q += f" WHERE {self.pred()}"
            q += " GROUP BY g"
            if r.random() < 0.3:
                q += f" HAVING {self.pred()}"
        elif shape == 2:  # join
            q = (f"SELECT {self.expr()}, t2.y FROM t1 "
                 f"{r.choice(['JOIN', 'LEFT JOIN', 'SEMI JOIN', 'ANTI JOIN'])} "
                 f"t2 ON t1.a = t2.a")
            if r.random() < 0.5:
                q += f" WHERE {self.pred()}"
        elif shape == 3:  # window
            fn = r.choice(["row_number()", "rank()", "lag(a)",
                           "sum(b)", "avg(f)"])
            q = (f"SELECT a, {fn} OVER (PARTITION BY g ORDER BY "
                 f"{r.choice(ALL_COLS)}) FROM t1")
        else:  # set op / distinct / subquery-from
            inner = f"SELECT {self.expr()} e FROM t1 WHERE {self.pred()}"
            q = (f"SELECT DISTINCT e FROM ({inner}) s"
                 if r.random() < 0.5
                 else f"{inner} UNION ALL {inner}")
        if r.random() < 0.4:
            q += f" ORDER BY 1{' DESC' if r.random() < 0.5 else ''}"
        if r.random() < 0.3:
            q += f" LIMIT {r.randint(0, 20)}"
        return q


def run_fuzz(n: int, seed: int = 0, con=None, on_fail=None):
    """Run n random queries; returns (n_ok, n_rejected, failures).

    failures = [(sql, exception)] for NON-acceptable errors."""
    import duckdb_tpu

    if con is None:
        con = duckdb_tpu.connect()
        for stmt in SETUP:
            con.sql(stmt)
    fz = SqlFuzzer(seed)
    n_ok = n_rej = 0
    failures = []
    for i in range(n):
        sql = fz.query()
        try:
            con.sql(sql)
            n_ok += 1
        except Exception as e:  # noqa: BLE001 — classifying is the point
            if type(e).__name__ in ACCEPTABLE or \
                    isinstance(e, ValueError):
                n_rej += 1
            else:
                failures.append((sql, e))
                if on_fail is not None:
                    on_fail(sql, e)
    return n_ok, n_rej, failures
