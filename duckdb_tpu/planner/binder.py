"""Expression binder: parsed AST → typed BoundExpr against a name scope.

Parallels the reference's ExpressionBinder family
(/root/reference/src/planner/expression_binder/) collapsed into one
dispatcher. Aggregate calls are intercepted via a collector callback so the
select/having binder can split pre- and post-aggregation computation, like
duckdb's BoundAggregateExpression extraction.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp

from duckdb_tpu.blocks import Column
from duckdb_tpu.sql import nodes as N
from duckdb_tpu.planner import bound as B
from duckdb_tpu.planner import functions as F
from duckdb_tpu.planner import functions_ext as _Fext  # noqa: F401 (registry side effects)
from duckdb_tpu.planner import functions_nested as _Fnest  # noqa: F401 (registry side effects)
from duckdb_tpu.planner import functions_more as _Fmore  # noqa: F401 (registry side effects)
from duckdb_tpu.planner import functions_parity as _Fpar  # noqa: F401 (registry side effects)
from duckdb_tpu.storage import json_io as _Fjson  # noqa: F401 (registry side effects)
from duckdb_tpu.types import (
    BLOB,
    TIME,
    BIGINT,
    BOOLEAN,
    DATE,
    DOUBLE,
    HUGEINT,
    INTEGER,
    INTERVAL,
    SMALLINT,
    SQLNULL,
    TIMESTAMP,
    TINYINT,
    VARCHAR,
    LogicalType,
    TypeId,
    decimal,
    max_logical_type,
)

AGGREGATE_NAMES = {
    "sum", "count", "avg", "mean", "min", "max", "first", "last", "any_value",
    "stddev", "stddev_samp", "stddev_pop", "var_samp", "var_pop", "variance",
    "string_agg", "bool_and", "bool_or", "product", "bit_and", "bit_or", "bit_xor",
    "count_star", "arg_min", "arg_max", "median", "mode", "approx_count_distinct",
    "quantile", "quantile_cont", "quantile_disc", "approx_quantile",
    "group_concat", "listagg", "list", "array_agg", "histogram",
    "corr", "covar_pop", "covar_samp", "regr_slope", "regr_intercept",
    "regr_r2", "regr_count", "regr_avgx", "regr_avgy", "regr_sxx",
    "regr_syy", "regr_sxy", "skewness", "kurtosis", "kurtosis_pop",
    "entropy", "sem", "mad", "count_if", "countif", "arbitrary",
    "argmax", "argmin", "max_by", "min_by", "favg", "fsum", "sumkahan",
    "kahan_sum", "sum_no_overflow", "reservoir_quantile",
    "arg_min_null", "arg_max_null", "arg_min_nulls_last",
    "arg_max_nulls_last", "approx_top_k", "bitstring_agg",
    "histogram_exact", "lttb",
}


class BindError(B.BindError):
    pass


@dataclass
class Binding:
    key: str
    ltype: LogicalType


class Scope:
    """Column name resolution: alias.col and unqualified col → binding."""

    def __init__(self, parent: Optional["Scope"] = None):
        self.parent = parent
        self.by_qual: Dict[Tuple[str, str], Binding] = {}
        self.by_name: Dict[str, List[Binding]] = {}
        self.order: List[Tuple[str, str, Binding]] = []  # (alias, col, binding)

    def add(self, alias: str, col: str, key: str, ltype: LogicalType):
        b = Binding(key, ltype)
        self.by_qual[(alias.lower(), col.lower())] = b
        self.by_name.setdefault(col.lower(), []).append(b)
        self.order.append((alias, col, b))
        return b

    def resolve(self, parts: Tuple[str, ...]) -> Binding:
        if len(parts) == 1:
            cands = self.by_name.get(parts[0].lower(), [])
            if len(cands) == 1:
                return cands[0]
            if len(cands) > 1:
                raise BindError(f'ambiguous column name "{parts[0]}"')
        elif len(parts) >= 2:
            b = self.by_qual.get((parts[-2].lower(), parts[-1].lower()))
            if b:
                return b
        if self.parent is not None:
            return self.parent.resolve(parts)
        raise BindError(
            f'Binder Error: column "{".".join(parts)}" not found'
        )

    def try_resolve(self, parts) -> Optional[Binding]:
        try:
            return self.resolve(parts)
        except BindError:
            return None

    def remove_keys(self, keys) -> None:
        """Drop bindings whose key is in `keys` (semi/anti join build
        columns leave scope after the join — reference binder hides the
        right side of SEMI/ANTI syntax joins)."""
        keys = set(keys)
        self.by_qual = {q: b for q, b in self.by_qual.items()
                        if b.key not in keys}
        self.by_name = {n: [b for b in bs if b.key not in keys]
                        for n, bs in self.by_name.items()}
        self.by_name = {n: bs for n, bs in self.by_name.items() if bs}
        self.order = [(a, c, b) for (a, c, b) in self.order
                      if b.key not in keys]

    def columns_of(self, alias: str):
        return [(a, c, b) for (a, c, b) in self.order if a.lower() == alias.lower()]

    def all_columns(self):
        return list(self.order)


def _parse_date(s: str) -> int:
    d = datetime.date.fromisoformat(s.strip())
    return (d - datetime.date(1970, 1, 1)).days


def _parse_timestamptz(s: str) -> int:
    """Text → UTC micros. Accepts an optional ±HH[:MM] offset or Z;
    offset-less text is interpreted in the session TimeZone (UTC)."""
    s = s.strip()
    if s.endswith(("Z", "z")):
        s = s[:-1]
    dt = datetime.datetime.fromisoformat(s)
    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    epoch = datetime.datetime(1970, 1, 1)
    return int((dt - epoch).total_seconds() * 1_000_000)


def _parse_timestamp(s: str) -> int:
    s = s.strip()
    # duckdb rejects a time part with only an hour ('1111-11-11 11');
    # python's fromisoformat accepts it — pre-check the shape
    if len(s) > 10:
        time_part = s[11:]
        if time_part and ":" not in time_part \
                and not time_part.startswith(("+", "-")) \
                and time_part not in ("", "Z"):
            raise ValueError(f"invalid timestamp: {s!r}")
    dt = datetime.datetime.fromisoformat(s)
    epoch = datetime.datetime(1970, 1, 1)
    return int((dt - epoch).total_seconds() * 1_000_000)


_INTERVAL_MULT = {
    "year": ("months", 12), "years": ("months", 12), "y": ("months", 12),
    "month": ("months", 1), "months": ("months", 1), "mon": ("months", 1),
    "day": ("days", 1), "days": ("days", 1), "d": ("days", 1),
    "week": ("days", 7), "weeks": ("days", 7),
    "hour": ("micros", 3600_000_000), "hours": ("micros", 3600_000_000),
    "minute": ("micros", 60_000_000), "minutes": ("micros", 60_000_000),
    "second": ("micros", 1_000_000), "seconds": ("micros", 1_000_000),
}


def bind_interval(val: str, unit: Optional[str]) -> Tuple[int, int, int]:
    months = days = micros = 0
    if unit is not None:
        field_, mult = _INTERVAL_MULT[unit.lower()]
        n = int(val)
        if field_ == "months":
            months = n * mult
        elif field_ == "days":
            days = n * mult
        else:
            micros = n * mult
    else:
        toks = val.split()
        for i in range(0, len(toks) - 1, 2):
            field_, mult = _INTERVAL_MULT[toks[i + 1].lower()]
            n = int(toks[i])
            if field_ == "months":
                months += n * mult
            elif field_ == "days":
                days += n * mult
            else:
                micros += n * mult
    return (months, days, micros)


_TYPE_NAMES = {
    "boolean": BOOLEAN, "bool": BOOLEAN, "logical": BOOLEAN,
    "tinyint": TINYINT, "int1": TINYINT,
    "smallint": SMALLINT, "int2": SMALLINT, "short": SMALLINT,
    "integer": INTEGER, "int": INTEGER, "int4": INTEGER, "signed": INTEGER,
    "bigint": BIGINT, "int8": BIGINT, "long": BIGINT,
    "hugeint": HUGEINT, "int128": HUGEINT,
    "real": LogicalType(TypeId.FLOAT), "float4": LogicalType(TypeId.FLOAT),
    "float": DOUBLE, "double": DOUBLE, "float8": DOUBLE,
    "varchar": VARCHAR, "text": VARCHAR, "string": VARCHAR, "char": VARCHAR,
    "json": VARCHAR,  # the reference's JSON type aliases VARCHAR storage
    "bpchar": VARCHAR,
    # UUID: canonical lowercase hex text in the dict-encoded string plane.
    # Lexicographic dictionary order == unsigned int128 order for canonical
    # formatting, so ORDER BY/joins need no special casing (reference stores
    # int128: src/common/types/uuid.cpp).
    "uuid": VARCHAR, "guid": VARCHAR,
    "date": DATE, "timestamp": TIMESTAMP, "datetime": TIMESTAMP,
    "time": TIME,
    "blob": BLOB, "bytea": BLOB, "binary": BLOB, "varbinary": BLOB,
}

from duckdb_tpu.types import BIT as _BIT, TIMESTAMPTZ as _TSTZ  # noqa: E402

_TYPE_NAMES.update({
    "timestamptz": _TSTZ, "timetz": TIME,
    "bit": _BIT, "bitstring": _BIT,
})


def resolve_type_name(name: str, mods: Tuple[int, ...]) -> LogicalType:
    n = name.lower()
    if n.endswith("[]"):
        from duckdb_tpu.types import list_of

        return list_of(resolve_type_name(n[:-2], mods))
    m = re.match(r"^(.*)\[(\d+)\]$", n)
    if m:
        from duckdb_tpu.types import array_of

        return array_of(resolve_type_name(m.group(1), mods),
                        int(m.group(2)))
    if n.startswith("union(") and n.endswith(")"):
        from duckdb_tpu.types import union_of

        inner = resolve_type_name("struct(" + n[6:-1] + ")", ())
        return union_of(*inner.fields)
    if n.startswith("struct(") and n.endswith(")"):
        from duckdb_tpu.types import struct_of

        fields = []
        depth = 0
        part = ""
        for ch in n[7:-1] + ",":
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                fname, _, ftype = part.strip().partition(" ")
                fmods: Tuple[int, ...] = ()
                if "(" in ftype and ftype.endswith(")"):
                    base, _, rest = ftype.partition("(")
                    fmods = tuple(int(x) for x in rest[:-1].split(","))
                    ftype = base
                fields.append((fname, resolve_type_name(ftype.strip(),
                                                        fmods)))
                part = ""
            else:
                part += ch
        return struct_of(*fields)
    if n in ("decimal", "numeric"):
        w = mods[0] if mods else 18
        s = mods[1] if len(mods) > 1 else 3
        return decimal(w, s)
    if n in _TYPE_NAMES:
        return _TYPE_NAMES[n]
    ut = ACTIVE_USER_TYPES.get(n)
    if ut is not None:
        if ut.get("kind") == "enum":
            # ENUMs ride the dict-encoded string plane (the reference's
            # enum is likewise a dictionary: src/common/types/vector.cpp
            # ENUM physical type = dictionary index).
            return VARCHAR
        return resolve_type_name(ut["base"], tuple(ut.get("mods") or ()))
    raise BindError(f"unknown type name {name}")


# name -> {"kind": "enum", "values": [...]} | {"kind": "alias", "base": str,
# "mods": [...]}; assigned by the Connection from catalog.user_types (same
# pattern as macros.ACTIVE_MACROS).
ACTIVE_USER_TYPES = {}


def bind_literal(lit: N.Literal) -> B.BoundExpr:
    v, hint = lit.value, lit.type_hint
    if v is None:
        return B.BoundLiteral(None, SQLNULL)
    if hint == "decimal":
        s = str(v)
        neg = s.startswith("-")
        body = s.lstrip("+-")
        if "." in body:
            ip, fp = body.split(".")
        else:
            ip, fp = body, ""
        scale = len(fp)
        width = max(1, len(ip.lstrip("0")) + scale)
        iv = int(ip + fp) if ip + fp else 0
        return B.BoundLiteral(-iv if neg else iv, decimal(min(width, 38), scale))
    if hint == "date":
        return B.BoundLiteral(_parse_date(v), DATE)
    if hint == "timestamp":
        return B.BoundLiteral(_parse_timestamp(v), TIMESTAMP)
    if hint == "time":
        return B.BoundLiteral(_parse_time_micros(v), TIME)
    if isinstance(v, bool):
        return B.BoundLiteral(v, BOOLEAN)
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            t = INTEGER
        elif -(2**63) <= v < 2**63:
            t = BIGINT
        elif -(2**127) <= v < 2**127:
            t = HUGEINT  # reference promotes oversized literals to HUGEINT
        else:
            raise BindError(f"integer literal {v} out of range")
        return B.BoundLiteral(v, t)
    if isinstance(v, float):
        return B.BoundLiteral(v, DOUBLE)
    if isinstance(v, str):
        return B.BoundLiteral(v, VARCHAR)
    raise BindError(f"unsupported literal {v!r}")


def _parse_time_micros(v: str) -> int:
    """'HH:MM:SS[.ffffff]' → microseconds since midnight."""
    hh, mm, rest = v.split(":")
    if "." in rest:
        ss, frac = rest.split(".")
        us = int((frac + "000000")[:6])
    else:
        ss, us = rest, 0
    return ((int(hh) * 3600 + int(mm) * 60 + int(ss)) * 1_000_000 + us)


def _arith_result_type(op: str, lt: LogicalType, rt: LogicalType) -> LogicalType:
    if TypeId.SQLNULL in (lt.id, rt.id):
        # NULL op x → typed NULL of the other side (reference: NULL
        # propagation through BoundCastExpression to the operand type)
        other = rt if lt.id is TypeId.SQLNULL else lt
        return other if other.id is not TypeId.SQLNULL else lt
    if TypeId.INTERVAL in (lt.id, rt.id):
        other = rt if lt.id is TypeId.INTERVAL else lt
        return other  # date ± interval → date (folded at bind time)
    if lt.id is TypeId.DATE and rt.id is TypeId.DATE and op == "-":
        return BIGINT
    if lt.id is TypeId.DATE and rt.is_integer:
        return DATE
    if rt.id is TypeId.DATE and lt.is_integer and op == "+":
        return DATE
    _temporal = (TypeId.DATE, TypeId.TIME, TypeId.TIMESTAMP,
                 TypeId.TIMESTAMPTZ)
    if lt.id in _temporal and rt.id in _temporal and op == "-":
        return INTERVAL  # timestamp difference
    if not (lt.is_numeric or lt.id is TypeId.BOOLEAN) \
            or not (rt.is_numeric or rt.id is TypeId.BOOLEAN):
        # the reference rejects arithmetic over VARCHAR/DATE-mixed
        # operand sets with a binder error ("No function matches")
        raise BindError(
            f"Binder Error: No function matches "
            f"'{op}({lt!r}, {rt!r})'. You might need to add explicit "
            f"type casts.")
    if lt.is_float or rt.is_float:
        return DOUBLE
    if TypeId.DECIMAL in (lt.id, rt.id):
        dl = lt if lt.id is TypeId.DECIMAL else decimal(_int_width(lt), 0)
        dr = rt if rt.id is TypeId.DECIMAL else decimal(_int_width(rt), 0)
        if op in ("+", "-"):
            s = max(dl.scale, dr.scale)
            intp = max(dl.width - dl.scale, dr.width - dr.scale) + 1
            return decimal(min(38, intp + s), s)
        if op == "*":
            return decimal(min(38, dl.width + dr.width), dl.scale + dr.scale)
        if op == "/":
            # duckdb: decimal division result scale max(6, s1+p2+1); falls
            # back to DOUBLE when width unbounded (src/function/scalar/operator/
            # decimal_division.cpp:137-166, arithmetic.cpp:1260-1264). Sums are
            # DECIMAL(38,_) so analytics divisions are DOUBLE; we bind DOUBLE.
            return DOUBLE
        raise BindError(f"unsupported decimal op {op}")
    if op == "/":
        return DOUBLE
    if lt.is_integer and rt.is_integer:
        order = [TypeId.TINYINT, TypeId.SMALLINT, TypeId.INTEGER, TypeId.BIGINT,
                 TypeId.HUGEINT]
        t = max(lt.id, rt.id, key=order.index)
        return LogicalType(t)
    raise BindError(f"cannot apply {op} to {lt} and {rt}")


def _int_width(t: LogicalType) -> int:
    return {TypeId.TINYINT: 3, TypeId.SMALLINT: 5, TypeId.INTEGER: 10,
            TypeId.BIGINT: 19, TypeId.HUGEINT: 38, TypeId.BOOLEAN: 1}[t.id]


class ExprBinder:
    """Binds AST expressions in a scope.

    agg_collector: callable(FunctionCall ast) → BoundAggregateRef, set when
    binding select/having/order lists of an aggregating query.
    subquery_binder: callable(ast node) → BoundExpr for Scalar/In/Exists
    subqueries (installed by the planner).
    """

    def __init__(self, scope: Scope, agg_collector=None, subquery_binder=None,
                 window_collector=None):
        self.scope = scope
        self.agg_collector = agg_collector
        self.subquery_binder = subquery_binder
        self.window_collector = window_collector

    def bind(self, e: N.Expr) -> B.BoundExpr:
        m = getattr(self, "_bind_" + type(e).__name__, None)
        if m is None:
            raise BindError(f"cannot bind expression node {type(e).__name__}")
        return m(e)

    # -- leaves --------------------------------------------------------------
    def _bind_Literal(self, e: N.Literal):
        return bind_literal(e)

    def _bind_IntervalLiteral(self, e: N.IntervalLiteral):
        return B.BoundLiteral(bind_interval(e.value, e.unit), INTERVAL)

    def _bind_ColumnRef(self, e: N.ColumnRef):
        try:
            b = self.scope.resolve(e.parts)
        except BindError:
            # keyword pseudo-columns (reference binds these as functions:
            # current_date/current_timestamp in default_functions.cpp)
            if len(e.parts) == 1 and e.parts[0].lower() in (
                    "current_date", "current_timestamp", "current_time",
                    "localtimestamp"):
                fc = N.FunctionCall(
                    {"current_date": "today",
                     "current_time": "now",
                     "localtimestamp": "now",
                     "current_timestamp": "now"}[e.parts[0].lower()], [])
                return self._bind_FunctionCall(fc)
            raise
        return B.BoundColumnRef(b.key, b.ltype)

    # -- operators -----------------------------------------------------------
    # COLLATE name → per-comparison string transform chain. Matches the
    # reference's built-in collations (src/main/database.cpp registers
    # NOCASE/NOACCENT/NFC; ICU locales are out of scope). A collated side
    # infects the comparison: the other side is transformed too.
    _COLLATIONS = {"nocase": "lower", "noaccent": "strip_accents",
                   "nfc": "nfc_normalize", "c": None, "binary": None,
                   "posix": None}

    def _apply_collation(self, b: B.BoundExpr, cname: str) -> B.BoundExpr:
        for part in cname.split("."):
            if part not in self._COLLATIONS:
                raise BindError(
                    f"Catalog Error: Collation with name {part} does not "
                    "exist!")
            fn = self._COLLATIONS[part]
            if fn is None:
                continue
            rt, impl, args = F.REGISTRY[fn]([b])
            b = B.BoundFunction(fn, args, rt, impl)
        return b

    def _bind_CollateExpr(self, e: N.CollateExpr):
        b = self._apply_collation(self.bind(e.child), e.collation)
        object.__setattr__(b, "collation", e.collation)
        return b

    def _bind_BinaryOp(self, e: N.BinaryOp):
        if e.op in B._CMP_OPS:
            left = self.bind(e.left)
            right = self.bind(e.right)
            lc = getattr(left, "collation", None)
            rc = getattr(right, "collation", None)
            if lc and not rc:
                right = self._apply_collation(right, lc)
            elif rc and not lc:
                left = self._apply_collation(left, rc)
            left, right = self._align_comparison(left, right)
            return B.BoundComparison(e.op, left, right)
        if e.op == "||":
            l0 = self.bind(e.left)
            if l0.ltype.id is TypeId.LIST:
                rt, impl, args2 = F.REGISTRY["list_concat"](
                    [l0, self.bind(e.right)])
                return B.BoundFunction("list_concat", args2, rt, impl)
            return self._bind_concat(e)
        left = self.bind(e.left)
        right = self.bind(e.right)
        t = _arith_result_type(e.op, left.ltype, right.ltype)
        node = B.BoundArithmetic(e.op, left, right, t)
        if node.is_const():
            try:
                return B.BoundLiteral(node.const_value(), t)
            except (ValueError, BindError):
                pass
        if TypeId.INTERVAL in (left.ltype.id, right.ltype.id):
            return self._bind_interval_arith(e.op, left, right)
        if t.id is TypeId.DATE:
            # date ± integer days stays int32 days
            node.ltype = DATE
        return node

    def _bind_interval_arith(self, op: str, left: B.BoundExpr,
                             right: B.BoundExpr) -> B.BoundExpr:
        """Runtime temporal ± interval (device intervals are int64 micros).

        Matches the reference's interval operators
        (src/common/operator/add.cpp AddOperator for date_t + interval_t):
        DATE ± INTERVAL and TIMESTAMP ± INTERVAL → TIMESTAMP, TIME wraps
        mod 24h, INTERVAL ± INTERVAL → INTERVAL. Month-granularity interval
        values require calendar arithmetic and stay bind-time-constant only.
        """
        from duckdb_tpu.planner.bound import _and_validity

        if op not in ("+", "-"):
            raise BindError(f"cannot apply {op} to interval operands")
        if left.ltype.id is not TypeId.INTERVAL:
            pass  # temporal ± interval
        elif right.ltype.id is TypeId.INTERVAL:
            pass  # interval ± interval
        elif op == "+":
            left, right = right, left  # interval + temporal → temporal + interval
        else:
            raise BindError("cannot subtract temporal from interval")

        def norm(x: B.BoundExpr) -> B.BoundExpr:
            # constant interval literals are (months, days, micros) tuples;
            # flatten to pure micros for device arithmetic
            if x.ltype.id is TypeId.INTERVAL and x.is_const():
                v = x.const_value()
                if isinstance(v, tuple):
                    months, days, micros = v
                    if months:
                        raise BindError(
                            "month-granularity interval with non-constant "
                            "operand not supported")
                    return B.BoundLiteral(
                        days * 86_400_000_000 + micros, INTERVAL)
            return x

        left, right = norm(left), norm(right)
        base = left.ltype.id
        out_t = {TypeId.DATE: TIMESTAMP, TypeId.TIMESTAMP: TIMESTAMP,
                 TypeId.TIME: TIME,
                 TypeId.INTERVAL: INTERVAL}.get(base)
        if out_t is None:
            raise BindError(
                f"cannot apply interval arithmetic to {left.ltype}")
        us_day = 86_400_000_000

        def impl(env, cols, node):
            a, b = cols
            x = a.data.astype(jnp.int64)
            y = b.data.astype(jnp.int64)
            if base is TypeId.DATE:
                x = x * jnp.int64(us_day)
            d = x + y if op == "+" else x - y
            if base is TypeId.TIME:
                d = jnp.mod(d, jnp.int64(us_day))
            return Column(data=d, ltype=out_t,
                          validity=_and_validity(a.validity, b.validity))

        return B.BoundFunction(f"__interval_{op}", [left, right], out_t, impl)

    def _align_comparison(self, left: B.BoundExpr, right: B.BoundExpr):
        """Insert casts so comparisons see compatible physical types."""
        lt, rt = left.ltype, right.ltype
        # VARCHAR literal vs temporal column → parse literal at bind time
        for a, b, swap in ((left, right, False), (right, left, True)):
            if (a.ltype.id is TypeId.VARCHAR and a.is_const()
                    and b.ltype.id in (TypeId.DATE, TypeId.TIMESTAMP)):
                v = a.const_value()
                lit = B.BoundLiteral(
                    _parse_date(v) if b.ltype.id is TypeId.DATE else _parse_timestamp(v),
                    b.ltype,
                )
                return (b, lit) if swap else (lit, b)
        if (lt.id is TypeId.VARCHAR) != (rt.id is TypeId.VARCHAR):
            raise BindError(f"cannot compare {lt} and {rt}")
        return left, right

    def _bind_concat(self, e: N.BinaryOp):
        left = self.bind(e.left)
        right = self.bind(e.right)
        # duckdb implicitly casts non-VARCHAR || operands to VARCHAR
        # (reference: '||' binds to concat, whose args are ANY→VARCHAR)
        if left.ltype.id is not TypeId.VARCHAR:
            left = B.BoundCast(left, VARCHAR)
        if right.ltype.id is not TypeId.VARCHAR:
            right = B.BoundCast(right, VARCHAR)

        def impl(env, cols, node):
            return concat_pair(env, cols[0], cols[1])

        return B.BoundFunction("concat", [left, right], VARCHAR, impl)

    def _bind_UnaryOp(self, e: N.UnaryOp):
        c = self.bind(e.child)
        if e.op == "-":
            node = B.BoundNegate(c, c.ltype)
            if node.is_const():
                return B.BoundLiteral(node.const_value(), c.ltype)
            return node
        if e.op == "+":
            return c
        raise BindError(f"unary {e.op}")

    def _bind_Conjunction(self, e: N.Conjunction):
        return B.BoundConjunction(e.op, [self.bind(c) for c in e.children])

    def _bind_NotExpr(self, e: N.NotExpr):
        return B.BoundNot(self.bind(e.child))

    def _bind_IsNull(self, e: N.IsNull):
        return B.BoundIsNull(self.bind(e.child), e.negated)

    def _bind_Between(self, e: N.Between):
        x = self.bind(e.expr)
        lo = self.bind(e.low)
        hi = self.bind(e.high)
        a, lo = self._align_comparison(x, lo)
        a2, hi = self._align_comparison(x, hi)
        node = B.BoundConjunction(
            "and", [B.BoundComparison(">=", a, lo), B.BoundComparison("<=", a2, hi)]
        )
        return B.BoundNot(node) if e.negated else node

    def _bind_LikeExpr(self, e: N.LikeExpr):
        child = self.bind(e.expr)
        pat = self.bind(e.pattern)
        if not pat.is_const():
            raise BindError("non-constant LIKE pattern not supported")
        return B.BoundLike(child, pat.const_value(), e.negated, e.case_insensitive)

    def _bind_InList(self, e: N.InList):
        return B.BoundInList(
            self.bind(e.expr), [self.bind(i) for i in e.items], e.negated
        )

    def _bind_CaseExpr(self, e: N.CaseExpr):
        whens = []
        for cond, res in e.whens:
            if e.operand is not None:
                cond = N.BinaryOp("=", e.operand, cond)
            whens.append((self.bind(cond), self.bind(res)))
        else_b = self.bind(e.else_expr) if e.else_expr is not None else None
        t = None
        for _, r in whens:
            if r.ltype.id is not TypeId.SQLNULL:
                t = r.ltype if t is None else max_logical_type(t, r.ltype)
        if else_b is not None and else_b.ltype.id is not TypeId.SQLNULL:
            t = else_b.ltype if t is None else max_logical_type(t, else_b.ltype)
        return B.BoundCase(whens, else_b, t or SQLNULL)

    def _bind_CastExpr(self, e: N.CastExpr):
        c = self.bind(e.child)
        t = resolve_type_name(e.type_name, e.type_mods)
        node = B.BoundCast(c, t, e.try_cast)
        ut = ACTIVE_USER_TYPES.get(e.type_name.lower())
        enum_name = e.type_name.lower() if (ut and ut.get("kind") == "enum") \
            else None
        if c.is_const():
            folded = None
            try:
                folded = (node.const_value(),)
            except (ValueError, BindError, KeyError):
                pass
            if folded is not None:
                v = folded[0]
                if enum_name is not None and v is not None \
                        and v not in ut["values"]:
                    if e.try_cast:
                        v = None
                    else:
                        raise BindError(
                            f"Conversion Error: Could not convert string "
                            f"'{v}' to enum {e.type_name}")
                lit = B.BoundLiteral(v, t)
                if enum_name is not None:
                    object.__setattr__(lit, "enum_type", enum_name)
                return lit
        if enum_name is not None:
            object.__setattr__(node, "enum_type", enum_name)
        return node

    def _bind_ExtractExpr(self, e: N.ExtractExpr):
        child = self.bind(e.child)
        rt, impl, args = F.REGISTRY[e.field.lower()]([child])
        return B.BoundFunction("extract_" + e.field.lower(), args, rt, impl)

    def _bind_FunctionCall(self, e: N.FunctionCall):
        name = e.name.lower()
        from duckdb_tpu.planner import macros as M

        mac = M.ACTIVE_MACROS.get(name)
        if mac is not None and not mac.is_table:
            pos, named = M.split_args(e.args)
            try:
                expanded = M.expand_call(mac, pos, named)
            except M.MacroError as err:
                raise BindError(str(err))
            with M.expansion_guard(name):
                return self.bind(expanded)
        if name in AGGREGATE_NAMES or (name == "count" and e.is_star):
            if self.agg_collector is None:
                raise BindError(f"aggregate {name}() not allowed here")
            return self.agg_collector(e, self)
        if (name in ("list_reduce", "array_reduce", "reduce")
                and len(e.args) == 2
                and isinstance(e.args[1], N.LambdaExpr)):
            # fold lambda: reduce(l, lambda acc, x: ...) (reference:
            # core_functions/scalar/list/list_reduce.cpp)
            from duckdb_tpu.planner.functions_nested import bind_reduce_func

            base = self.bind(e.args[0])
            lam = e.args[1]
            if not getattr(lam, "index_param", None):
                raise BindError(f"{name} requires a two-parameter lambda "
                                "(accumulator, element)")
            child_t = base.ltype.child or SQLNULL
            lscope = Scope()
            akey = f"__lambda_{lam.param}"
            xkey = f"__lambda_{lam.index_param}"
            lscope.add(lam.param, lam.param, akey, child_t)
            lscope.add(lam.index_param, lam.index_param, xkey, child_t)
            sub = ExprBinder(lscope, agg_collector=None,
                             subquery_binder=self.subquery_binder)
            body_b = sub.bind(lam.body)
            rt, impl = bind_reduce_func(name, base, body_b, akey, xkey,
                                        child_t)
            return B.BoundFunction(name, [base], rt, impl)
        if (name in ("list_transform", "array_transform", "apply",
                     "list_apply", "array_apply",
                     "list_filter", "array_filter", "filter")
                and len(e.args) == 2
                and isinstance(e.args[1], N.LambdaExpr)):
            from duckdb_tpu.planner.functions_nested import bind_lambda_func

            base = self.bind(e.args[0])
            lam = e.args[1]
            lscope = Scope()
            pkey = f"__lambda_{lam.param}"
            child_t = base.ltype.child or SQLNULL
            lscope.add(lam.param, lam.param, pkey, child_t)
            ikey = None
            if getattr(lam, "index_param", None):
                ikey = f"__lambda_{lam.index_param}"
                lscope.add(lam.index_param, lam.index_param, ikey, BIGINT)
            sub = ExprBinder(lscope, agg_collector=None,
                             subquery_binder=self.subquery_binder)
            body_b = sub.bind(lam.body)
            rt, impl = bind_lambda_func(name, base, body_b, pkey, child_t,
                                        ikey=ikey)
            return B.BoundFunction(name, [base], rt, impl)
        op_rewrite = self._op_function_rewrite(name, e.args)
        if op_rewrite is not None:
            return self.bind(op_rewrite)
        from duckdb_tpu.planner import functions_parity as FP

        if name in FP.MONTH_INTERVAL_FNS:
            # month-granularity interval constructors fold to bind-time
            # (months, days, micros) literals (functions_parity.py)
            arg = self.bind(e.args[0])
            if not arg.is_const():
                raise BindError(
                    f"{name} with non-constant argument not supported "
                    "(month-granularity intervals are calendar-dependent)")
            months = int(arg.const_value()) * FP.MONTH_INTERVAL_FNS[name]
            return B.BoundLiteral((months, 0, 0), INTERVAL)
        if name in ("struct_insert", "struct_update") and len(e.args) >= 2:
            base_b = self.bind(e.args[0])
            pairs = []
            for a in e.args[1:]:
                if (isinstance(a, N.BinaryOp)
                        and a.op in (":=", "=>", "=", "==")
                        and isinstance(a.left, N.ColumnRef)):
                    pairs.append((a.left.parts[-1], self.bind(a.right)))
                else:
                    raise BindError(
                        f"{name} requires named arguments (field := value)")
            rt, impl = FP.bind_struct_insert_update(name, base_b, pairs)
            return B.BoundFunction(name, [base_b], rt, impl)
        if name in F.REGISTRY:
            args = []
            for a in e.args:
                if (name in ("struct_pack", "row", "union_value")
                        and isinstance(a, N.BinaryOp)
                        and a.op in (":=", "=>")
                        and isinstance(a.left, N.ColumnRef)):
                    # named argument: field/tag := value
                    b = self.bind(a.right)
                    b.alias = a.left.parts[-1]
                    args.append(b)
                else:
                    args.append(self.bind(a))
            try:
                rt, impl, args2 = F.REGISTRY[name](args)
            except (IndexError, KeyError) as err:
                # binder-time metadata failures (missing/extra constant
                # args, unexpected argument types) are USER errors
                raise BindError(
                    f"Binder Error: invalid arguments to {name} ({err!r})")
            return B.BoundFunction(name, args2, rt, impl)
        raise BindError(f"Scalar Function with name {name} does not exist!")

    # operator functions: the reference registers every operator as a
    # callable function name ("+"(1,2), "~~"(s,p), "add"(a,b) — see
    # src/function/function_list.cpp operator entries); rewrite to the
    # equivalent AST so the full operator machinery (type promotion,
    # decimals, intervals, collation) applies
    _ARITH_NAMES = {"+": "+", "-": "-", "*": "*", "/": "/", "//": "//",
                    "%": "%", "add": "+", "subtract": "-", "multiply": "*",
                    "divide": "/", "mod": "%", "||": "||"}
    _CMP_NAMES = {"=", "==", "!=", "<>", "<", "<=", ">", ">="}

    def _op_function_rewrite(self, name, args):
        n = len(args)
        if name in self._ARITH_NAMES and n == 2:
            if name == "||":
                # string/list concat or... bitor? no: "||" is concat
                return N.BinaryOp("||", args[0], args[1])
            return N.BinaryOp(self._ARITH_NAMES[name], args[0], args[1])
        if name == "-" and n == 1:
            return N.UnaryOp("-", args[0])
        if name in self._CMP_NAMES and n == 2:
            op = {"==": "=", "!=": "<>"}.get(name, name)
            return N.BinaryOp(op, args[0], args[1])
        if name in ("~~", "!~~", "~~*", "!~~*") and n == 2:
            return N.LikeExpr(args[0], args[1],
                              negated=name.startswith("!"),
                              case_insensitive=name.endswith("*"))
        if name == "~~~" and n == 2:
            return N.FunctionCall("glob", args)
        if name == "^@" and n == 2:
            return N.FunctionCall("starts_with", args)
        if name == "@>" and n == 2:
            return N.FunctionCall("list_has_all", args)
        if name == "<@" and n == 2:
            return N.FunctionCall("list_has_all", [args[1], args[0]])
        if name == "&&" and n == 2:
            return N.FunctionCall("list_has_any", args)
        if name == "<->" and n == 2:
            return N.FunctionCall("list_distance", args)
        if name == "<=>" and n == 2:
            return N.FunctionCall("list_cosine_distance", args)
        if name in ("^", "**") and n == 2:
            return N.FunctionCall("power", args)
        if name == "@" and n == 1:
            return N.FunctionCall("abs", args)
        if name == "!__postfix" and n == 1:
            return N.FunctionCall("factorial", args)
        if name == "is distinct from" and n == 2:
            return N.IsDistinctFrom(args[0], args[1], negated=False)
        if name == "is not distinct from" and n == 2:
            return N.IsDistinctFrom(args[0], args[1], negated=True)
        if name == "__between" and n == 3:
            return N.Between(args[0], args[1], args[2])
        return None

    def _bind_WindowFunction(self, e):
        if self.window_collector is None:
            raise BindError("window functions not allowed in this context")
        return self.window_collector(e, self)

    # -- subqueries ----------------------------------------------------------
    def _bind_ScalarSubquery(self, e):
        if self.subquery_binder is None:
            raise BindError("subqueries not supported in this context")
        return self.subquery_binder(e, self)

    def _bind_InSubquery(self, e):
        if self.subquery_binder is None:
            raise BindError("subqueries not supported in this context")
        return self.subquery_binder(e, self)

    def _bind_Exists(self, e):
        if self.subquery_binder is None:
            raise BindError("subqueries not supported in this context")
        return self.subquery_binder(e, self)


def concat_pair(env, a, b):
    """VARCHAR || VARCHAR kernel: cross-product dictionary remap when the
    dictionary product is small (device-only, trace-safe), row-wise host
    concat for near-unique dictionaries (eager only — inside a trace
    np.asarray raises ConcretizationTypeError and the pipeline falls back
    to eager execution). NULL propagates (SQL || semantics)."""
    import jax.numpy as jnp
    import numpy as np

    if a.dict_values is None or b.dict_values is None:
        raise BindError("|| expects VARCHAR operands")
    valid = B._and_validity(a.validity, b.validity)
    na, nb = len(a.dict_values), len(b.dict_values)
    if nb == 1 and b.validity is None:
        sfx = str(b.dict_values[0])
        dev = None
        if sfx.isascii():
            from duckdb_tpu.ops.strings import op_concat_const

            dev = lambda p, le: op_concat_const(p, le, "", sfx)  # noqa: E731
        c = F.dict_transform(a, lambda s: s + sfx, device=dev,
                             device_key=f"concat:*:{sfx}")
        return B.Column(data=c.data, ltype=c.ltype, validity=valid,
                        dict_values=c.dict_values)
    if na == 1 and a.validity is None:
        pre = str(a.dict_values[0])
        dev = None
        if pre.isascii():
            from duckdb_tpu.ops.strings import op_concat_const

            dev = lambda p, le: op_concat_const(p, le, pre, "")  # noqa: E731
        c = F.dict_transform(b, lambda s: pre + s, device=dev,
                             device_key=f"concat:{pre}:*")
        return B.Column(data=c.data, ltype=c.ltype, validity=valid,
                        dict_values=c.dict_values)
    if na * nb <= (1 << 18):
        prod = np.array([x + y for x in a.dict_values
                         for y in b.dict_values], dtype=object)
        uniq, inv = np.unique(prod.astype(str), return_inverse=True)
        lut = jnp.asarray(inv.astype(np.int32))
        code = (jnp.clip(a.data, 0, na - 1).astype(jnp.int32)
                * jnp.int32(nb)
                + jnp.clip(b.data, 0, nb - 1).astype(jnp.int32))
        return B.Column(data=lut[code], ltype=VARCHAR, validity=valid,
                        dict_values=uniq.astype(object))
    ac = np.asarray(jnp.broadcast_to(a.data, (env.plen,)))
    bc = np.asarray(jnp.broadcast_to(b.data, (env.plen,)))
    strs = np.char.add(
        a.dict_values[np.clip(ac, 0, na - 1)].astype(str),
        b.dict_values[np.clip(bc, 0, nb - 1)].astype(str))
    uniq, inv = np.unique(strs, return_inverse=True)
    return B.Column(data=jnp.asarray(inv.astype(np.int32)),
                    ltype=VARCHAR, validity=valid,
                    dict_values=uniq.astype(object))
