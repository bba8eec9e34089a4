"""Bound (typed, resolved) expressions and their device evaluation.

The reference splits ParsedExpression → BoundExpression → ExpressionExecutor
(/root/reference/src/planner/expression/, src/execution/expression_executor.cpp).
Here bound nodes carry their own vectorized evaluation: each node's
``eval(env)`` returns a Column of jnp data over the padded block, with SQL
three-valued NULL semantics via validity planes. XLA fuses the resulting
elementwise graphs; there is no per-row interpreter.

VARCHAR columns are dictionary codes (sorted dict). String predicates are
evaluated once per *distinct value* on the host dictionary and become a
device LUT gather — the TPU analog of duckdb evaluating a filter on a
DICTIONARY vector's child (src/common/types/vector.cpp dictionary paths).

DECIMAL is scaled int64; arithmetic follows duckdb's bind rules
(src/function/scalar/operator/arithmetic.cpp, decimal_division.cpp):
add/sub rescale to max scale, mul adds scales, division falls back to
DOUBLE when the result width cannot be guaranteed ≤ 38.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_tpu.blocks import Column
from duckdb_tpu.types import (
    BIGINT,
    BOOLEAN,
    DATE,
    DOUBLE,
    INTEGER,
    INTERVAL,
    SQLNULL,
    TIMESTAMP,
    VARCHAR,
    LogicalType,
    TypeId,
    decimal,
    max_logical_type,
)


class BindError(ValueError):
    pass


@dataclass
class EvalEnv:
    """Evaluation environment: bound column key → Column, over one padded block."""

    cols: dict
    plen: int
    live: jnp.ndarray  # (P,) bool — rows alive (not padding / not filtered out)


def _and_validity(a: Optional[jnp.ndarray], b: Optional[jnp.ndarray]):
    if a is None:
        return b
    if b is None:
        return a
    return jnp.logical_and(a, b)


def _bcast(env: EvalEnv, data):
    """Broadcast a scalar jnp value to the block length."""
    return jnp.broadcast_to(data, (env.plen,))


# ---------------------------------------------------------------------------
# date math on device (days since 1970-01-01 → civil fields)
# Branchless civil-from-days (Howard Hinnant's algorithm) — pure VPU ops.
def civil_from_days(days: jnp.ndarray):
    z = days.astype(jnp.int64) + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = jnp.where(m <= 2, y + 1, y)
    return y, m, d


def days_from_civil(y: int, m: int, d: int) -> int:
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


# ---------------------------------------------------------------------------
# bound expression nodes
class BoundExpr:
    ltype: LogicalType

    def eval(self, env: EvalEnv) -> Column:
        raise NotImplementedError

    def is_const(self) -> bool:
        return False

    def const_value(self):
        """Python-level value for constant subtrees (folded at bind time).

        DECIMAL → scaled int, DATE → days, VARCHAR → str, NULL → None.
        """
        raise BindError("not a constant expression")

    def children(self) -> List["BoundExpr"]:
        return []


@dataclass
class BoundColumnRef(BoundExpr):
    key: str
    ltype: LogicalType

    def eval(self, env: EvalEnv) -> Column:
        return env.cols[self.key]


@dataclass
class BoundLiteral(BoundExpr):
    value: object  # physical value: scaled int for DECIMAL, days for DATE, str for VARCHAR
    ltype: LogicalType

    def eval(self, env: EvalEnv) -> Column:
        if self.value is None:
            return Column(
                data=jnp.zeros((env.plen,), dtype=jnp.int32),
                ltype=self.ltype,
                validity=jnp.zeros((env.plen,), dtype=jnp.bool_),
            )
        if self.ltype.id is TypeId.VARCHAR:
            # constant string → single-entry dictionary, code 0
            return Column(
                data=jnp.zeros((env.plen,), dtype=jnp.int32),
                ltype=VARCHAR,
                dict_values=np.array([self.value], dtype=object),
            )
        if self.ltype.id in (TypeId.LIST, TypeId.STRUCT, TypeId.MAP,
                             TypeId.ARRAY, TypeId.UNION, TypeId.BIT):
            # nested constant → single-entry dictionary, code 0
            d = np.empty(1, dtype=object)
            d[0] = (self.value if self.ltype.id is TypeId.BIT
                    else tuple(self.value))
            return Column(data=jnp.zeros((env.plen,), dtype=jnp.int32),
                          ltype=self.ltype, dict_values=d)
        if self.ltype.id is TypeId.INTERVAL and isinstance(
                self.value, (tuple, list)):
            # (months, days, micros) → device int64 micros; months use the
            # reference's 30-day comparison convention
            # (src/common/types/interval.cpp Interval::GetMicro)
            mo, dd, us = self.value
            v = (mo * 30 + dd) * 86_400_000_000 + us
            return Column(data=_bcast(env, jnp.asarray(v, dtype=jnp.int64)),
                          ltype=self.ltype)
        if (self.ltype.id is TypeId.HUGEINT
                and not -(2**63) <= int(self.value) < 2**63):
            # oversized literal: (lo, hi) wide planes (int128 carrier)
            v = int(self.value)
            lo = np.uint64(v & ((1 << 64) - 1)).astype(np.int64)
            return Column(
                data=_bcast(env, jnp.asarray(lo, dtype=jnp.int64)),
                data_hi=_bcast(env, jnp.asarray(v >> 64, dtype=jnp.int64)),
                ltype=self.ltype)
        return Column(
            data=_bcast(env, jnp.asarray(self.value, dtype=self.ltype.np_dtype)),
            ltype=self.ltype,
        )

    def is_const(self):
        return True

    def const_value(self):
        return self.value


_CMP_OPS = {"=", "==", "<>", "!=", "<", "<=", ">", ">="}


def _varchar_rank_luts(a: Column, b: Column):
    """Device LUTs mapping each side's codes to ranks in the merged dictionary."""
    if a.dict_values is b.dict_values:
        n = len(a.dict_values)
        lut = jnp.arange(n, dtype=jnp.int32)
        return lut, lut
    merged = np.union1d(a.dict_values, b.dict_values)
    ra = np.searchsorted(merged, a.dict_values).astype(np.int32)
    rb = np.searchsorted(merged, b.dict_values).astype(np.int32)
    return jnp.asarray(ra), jnp.asarray(rb)


def _cmp(op: str, x, y):
    if op in ("=", "=="):
        return x == y
    if op in ("<>", "!="):
        return x != y
    if op == "<":
        return x < y
    if op == "<=":
        return x <= y
    if op == ">":
        return x > y
    return x >= y


@dataclass
class BoundComparison(BoundExpr):
    op: str
    left: BoundExpr
    right: BoundExpr
    ltype: LogicalType = BOOLEAN

    def children(self):
        return [self.left, self.right]

    def eval(self, env: EvalEnv) -> Column:
        lc = self.left.eval(env)
        rc = self.right.eval(env)
        if lc.ltype.id is TypeId.VARCHAR or rc.ltype.id is TypeId.VARCHAR:
            data = self._eval_varchar(lc, rc)
        elif (lc.data_hi is not None or rc.data_hi is not None) \
                and not (lc.ltype.is_float or rc.ltype.is_float):
            data = _wide_compare(self.op, lc, rc, env.plen)
        elif (TypeId.DECIMAL in (lc.ltype.id, rc.ltype.id)
              and not (lc.ltype.is_float or rc.ltype.is_float)
              and lc.ltype.scale != rc.ltype.scale):
            data = _decimal_compare(self.op, lc, rc)
        else:
            x, y = _common_numeric(lc, rc)
            data = _cmp(self.op, x, y)
        v = _and_validity(lc.validity, rc.validity)
        return Column(data=data, ltype=BOOLEAN, validity=v)

    def _eval_varchar(self, lc: Column, rc: Column):
        assert lc.ltype.id is TypeId.VARCHAR and rc.ltype.id is TypeId.VARCHAR, (
            "varchar comparison requires both sides varchar"
        )
        la, lb = _varchar_rank_luts(lc, rc)
        return _cmp(self.op, la[lc.data], lb[rc.data])


def varchar_where(take, a: Column, b: Column, plen):
    """Elementwise select over two VARCHAR columns with dictionary union."""
    da = jnp.broadcast_to(a.data, (plen,))
    db = jnp.broadcast_to(b.data, (plen,))
    if a.dict_values is b.dict_values:
        return jnp.where(take, da, db), a.dict_values
    merged = np.union1d(a.dict_values, b.dict_values).astype(object)
    ra = jnp.asarray(np.searchsorted(merged, a.dict_values).astype(np.int32))
    rb = jnp.asarray(np.searchsorted(merged, b.dict_values).astype(np.int32))
    data = jnp.where(take,
                     ra[jnp.clip(da, 0, len(a.dict_values) - 1)],
                     rb[jnp.clip(db, 0, len(b.dict_values) - 1)])
    return data, merged


def _decimal_compare(op: str, lc: Column, rc: Column):
    """Exact mixed-scale decimal comparison without rescale overflow.

    x·10^d ⋛ y is decided via q = ⌊y/10^d⌋, r = y mod 10^d (both exact in
    int64): x>q ⇒ gt; x==q ⇒ (r==0 ? eq : lt-for-x). The reference instead
    widens to int128 (src/common/types/hugeint.cpp); this stays in 64-bit.
    """
    sl = lc.ltype.scale if lc.ltype.id is TypeId.DECIMAL else 0
    sr = rc.ltype.scale if rc.ltype.id is TypeId.DECIMAL else 0
    x = lc.data.astype(jnp.int64)
    y = rc.data.astype(jnp.int64)
    flip = sl > sr
    if flip:
        x, y, sl, sr = y, x, sr, sl
    d = jnp.int64(10 ** (sr - sl))
    q = jnp.floor_divide(y, d)
    r = y - q * d  # 0 <= r < d (floor semantics hold for negatives)
    lt = jnp.logical_or(x < q, jnp.logical_and(x == q, r > 0))
    eq = jnp.logical_and(x == q, r == 0)
    if flip:
        lt = jnp.logical_not(jnp.logical_or(lt, eq))  # y·10^d < x ⇔ not (x<=y)
    if op in ("=", "=="):
        return eq
    if op in ("<>", "!="):
        return jnp.logical_not(eq)
    if op == "<":
        return lt
    if op == "<=":
        return jnp.logical_or(lt, eq)
    if op == ">":
        return jnp.logical_not(jnp.logical_or(lt, eq))
    return jnp.logical_not(lt)  # >=


def _decimal_align(lc: Column, rc: Column):
    """Rescale two decimal/integer columns to a common scale (int64)."""
    sl = lc.ltype.scale if lc.ltype.id is TypeId.DECIMAL else 0
    sr = rc.ltype.scale if rc.ltype.id is TypeId.DECIMAL else 0
    s = max(sl, sr)
    x = lc.data.astype(jnp.int64) * jnp.int64(10 ** (s - sl))
    y = rc.data.astype(jnp.int64) * jnp.int64(10 ** (s - sr))
    return x, y, s


def _wide_compare(op: str, lc: Column, rc: Column, plen: int):
    """int128 comparison via (hi, lo) limbs: hi compares signed, lo
    unsigned (two's complement lexicographic). Covers HUGEINT values
    beyond int64 (wide sums, oversized literals)."""
    def limbs(c):
        lo = jnp.broadcast_to(c.data, (plen,)).astype(jnp.int64)
        hi = (jnp.broadcast_to(c.data_hi, (plen,)).astype(jnp.int64)
              if c.data_hi is not None else lo >> 63)
        # unsigned ordering key for the low limb: flip the sign bit
        ulo = lo ^ jnp.int64(-(2**63))
        return hi, ulo

    ha, ua = limbs(lc)
    hb, ub = limbs(rc)
    eq = jnp.logical_and(ha == hb, ua == ub)
    lt = jnp.logical_or(ha < hb, jnp.logical_and(ha == hb, ua < ub))
    if op in ("=", "=="):
        return eq
    if op in ("<>", "!="):
        return jnp.logical_not(eq)
    if op == "<":
        return lt
    if op == "<=":
        return jnp.logical_or(lt, eq)
    if op == ">":
        return jnp.logical_not(jnp.logical_or(lt, eq))
    return jnp.logical_not(lt)


def _common_numeric(lc: Column, rc: Column):
    """Coerce two non-varchar columns to comparable device arrays."""
    if TypeId.DECIMAL in (lc.ltype.id, rc.ltype.id):
        if lc.ltype.is_float or rc.ltype.is_float:
            return _to_double(lc), _to_double(rc)
        x, y, _ = _decimal_align(lc, rc)
        return x, y
    if lc.ltype.is_float or rc.ltype.is_float:
        return _to_double(lc), _to_double(rc)
    x = lc.data.astype(jnp.int64)
    y = rc.data.astype(jnp.int64)
    # DATE (days) vs TIMESTAMP (micros): promote the DATE side, matching
    # the reference's implicit date→timestamp cast in comparisons
    # (/root/reference/src/function/cast/time_casts.cpp)
    lt, rt = lc.ltype.id, rc.ltype.id
    _ts = (TypeId.TIMESTAMP, TypeId.TIMESTAMPTZ)
    if (lt in _ts or rt in _ts) and TypeId.DATE in (lt, rt):
        if lt is TypeId.DATE:
            x = x * jnp.int64(86_400_000_000)
        else:
            y = y * jnp.int64(86_400_000_000)
    return x, y


def _to_double(c: Column) -> jnp.ndarray:
    if c.ltype.id is TypeId.DECIMAL:
        d = c.data.astype(jnp.float64) / jnp.float64(10**c.ltype.scale)
    else:
        d = c.data.astype(jnp.float64)
    if c.data_hi is not None:
        # wide value = hi·2^64 + uint64(lo): lift the low limb to its
        # unsigned magnitude, then add the high limb's contribution
        scale = jnp.float64(10**c.ltype.scale
                            if c.ltype.id is TypeId.DECIMAL else 1)
        ulo = d + jnp.where(c.data < 0, jnp.float64(2.0**64) / scale, 0.0)
        d = c.data_hi.astype(jnp.float64) * (jnp.float64(2.0**64) / scale) \
            + ulo
    return d


@dataclass
class BoundConjunction(BoundExpr):
    op: str  # 'and' | 'or'
    exprs: List[BoundExpr]
    ltype: LogicalType = BOOLEAN

    def children(self):
        return self.exprs

    def eval(self, env: EvalEnv) -> Column:
        # SQL three-valued logic: NULL and false = false; NULL or true = true
        data = None
        valid = None
        for e in self.exprs:
            c = e.eval(env)
            d = jnp.broadcast_to(c.data.astype(jnp.bool_), (env.plen,))
            cv = (
                jnp.broadcast_to(c.validity, (env.plen,))
                if c.validity is not None
                else jnp.ones((env.plen,), jnp.bool_)
            )
            if data is None:
                data, valid = d, cv
            elif self.op == "and":
                new_valid = (valid & cv) | (valid & ~data) | (cv & ~d)
                data = data & d
                valid = new_valid
            else:
                new_valid = (valid & cv) | (valid & data) | (cv & d)
                data = data | d
                valid = new_valid
        return Column(data=data, ltype=BOOLEAN, validity=valid)


@dataclass
class BoundNot(BoundExpr):
    child: BoundExpr
    ltype: LogicalType = BOOLEAN

    def children(self):
        return [self.child]

    def eval(self, env):
        c = self.child.eval(env)
        return Column(
            data=jnp.logical_not(c.data.astype(jnp.bool_)),
            ltype=BOOLEAN,
            validity=c.validity,
        )


@dataclass
class BoundIsNull(BoundExpr):
    child: BoundExpr
    negated: bool = False
    ltype: LogicalType = BOOLEAN

    def children(self):
        return [self.child]

    def eval(self, env):
        c = self.child.eval(env)
        if c.validity is None:
            d = jnp.broadcast_to(jnp.asarray(self.negated), (env.plen,))
        else:
            v = jnp.broadcast_to(c.validity, (env.plen,))
            d = v if self.negated else jnp.logical_not(v)
        return Column(data=d, ltype=BOOLEAN)


@dataclass
class BoundArithmetic(BoundExpr):
    op: str  # + - * / % //
    left: BoundExpr
    right: BoundExpr
    ltype: LogicalType = DOUBLE

    def children(self):
        return [self.left, self.right]

    def eval(self, env: EvalEnv) -> Column:
        lc = self.left.eval(env)
        rc = self.right.eval(env)
        v = _and_validity(lc.validity, rc.validity)
        t = self.ltype
        if t.id is TypeId.DOUBLE or t.id is TypeId.FLOAT:
            x, y = _to_double(lc), _to_double(rc)
            if self.op == "+":
                d = x + y
            elif self.op == "-":
                d = x - y
            elif self.op == "*":
                d = x * y
            elif self.op == "/":
                d = x / y
            elif self.op == "%":
                d = jnp.mod(x, y)
            else:
                d = jnp.floor_divide(x, y)
            return Column(data=d, ltype=t, validity=v)
        if t.id is TypeId.DECIMAL:
            if self.op in ("+", "-"):
                x, y, _ = _decimal_align(lc, rc)
                d = x + y if self.op == "+" else x - y
            elif self.op == "*":
                d = lc.data.astype(jnp.int64) * rc.data.astype(jnp.int64)
            else:
                raise BindError(f"decimal op {self.op} should have bound to DOUBLE")
            return Column(data=d, ltype=t, validity=v)
        # integer arithmetic
        x = lc.data.astype(t.np_dtype)
        y = rc.data.astype(t.np_dtype)
        if self.op == "+":
            d = x + y
        elif self.op == "-":
            d = x - y
        elif self.op == "*":
            d = x * y
        elif self.op in ("%", "//"):
            # x % 0 and x // 0 are NULL (reference: division-by-zero
            # propagates NULL for integer modulo/intdiv,
            # src/common/operator/numeric_binary_operators.hpp)
            zero = y == 0
            safe = jnp.where(zero, jnp.ones_like(y), y)
            d = jnp.mod(x, safe) if self.op == "%" \
                else jnp.floor_divide(x, safe)
            nz = jnp.logical_not(zero)
            v = nz if v is None else jnp.logical_and(v, nz)
        else:
            raise BindError("integer / binds to DOUBLE")
        return Column(data=d, ltype=t, validity=v)

    def is_const(self):
        return self.left.is_const() and self.right.is_const()

    def const_value(self):
        from duckdb_tpu.planner.fold import fold_arithmetic

        return fold_arithmetic(self)


@dataclass
class BoundNegate(BoundExpr):
    child: BoundExpr
    ltype: LogicalType = DOUBLE

    def children(self):
        return [self.child]

    def eval(self, env):
        c = self.child.eval(env)
        return Column(data=-c.data, ltype=self.ltype, validity=c.validity)

    def is_const(self):
        return self.child.is_const()

    def const_value(self):
        v = self.child.const_value()
        return None if v is None else -v


@dataclass
class BoundCase(BoundExpr):
    whens: List[Tuple[BoundExpr, BoundExpr]]
    else_expr: Optional[BoundExpr]
    ltype: LogicalType = DOUBLE

    def children(self):
        out = []
        for c, r in self.whens:
            out += [c, r]
        if self.else_expr:
            out.append(self.else_expr)
        return out

    def eval(self, env: EvalEnv) -> Column:
        # evaluate all branches, select backwards (first-match-wins)
        if self.else_expr is not None:
            acc = _coerce_to(self.else_expr.eval(env), self.ltype, env)
        else:
            acc = Column(
                data=jnp.zeros((env.plen,), dtype=self.ltype.np_dtype),
                ltype=self.ltype,
                validity=jnp.zeros((env.plen,), jnp.bool_),
                dict_values=(np.array([""], dtype=object)
                             if self.ltype.id is TypeId.VARCHAR else None),
            )
        acc_data = jnp.broadcast_to(acc.data, (env.plen,))
        acc_dict = acc.dict_values
        acc_valid = (
            jnp.broadcast_to(acc.validity, (env.plen,))
            if acc.validity is not None
            else jnp.ones((env.plen,), jnp.bool_)
        )
        for cond, res in reversed(self.whens):
            cc = cond.eval(env)
            take = jnp.broadcast_to(cc.data.astype(jnp.bool_), (env.plen,))
            if cc.validity is not None:
                take = jnp.logical_and(take, cc.validity)
            rc = _coerce_to(res.eval(env), self.ltype, env)
            rv = (
                jnp.broadcast_to(rc.validity, (env.plen,))
                if rc.validity is not None
                else jnp.ones((env.plen,), jnp.bool_)
            )
            if self.ltype.id is TypeId.VARCHAR:
                acc_col = Column(data=acc_data, ltype=self.ltype,
                                 dict_values=acc_dict)
                acc_data, acc_dict = varchar_where(take, rc, acc_col, env.plen)
            else:
                rd = jnp.broadcast_to(rc.data, (env.plen,))
                acc_data = jnp.where(take, rd, acc_data)
            acc_valid = jnp.where(take, rv, acc_valid)
        return Column(data=acc_data, ltype=self.ltype, validity=acc_valid,
                      dict_values=acc_dict)


def _coerce_to(c: Column, t: LogicalType, env: EvalEnv,
               try_cast: bool = False) -> Column:
    """Cast an evaluated column to the target logical type's physical form."""
    if c.ltype == t:
        return c
    if c.ltype.id is TypeId.VARCHAR and t.id is TypeId.BLOB:
        # dict-encoded relabel: utf-8 encode each distinct value
        dv = np.array([s if isinstance(s, bytes) else str(s).encode()
                       for s in c.dict_values], dtype=object)
        return Column(data=c.data, ltype=t, validity=c.validity,
                      dict_values=dv)
    if c.ltype.id is TypeId.BLOB and t.id is TypeId.VARCHAR:
        dv = np.array([bytes(s).decode() if not isinstance(s, str) else s
                       for s in c.dict_values], dtype=object)
        return Column(data=c.data, ltype=t, validity=c.validity,
                      dict_values=dv)
    if (c.ltype.id is TypeId.VARCHAR and t.id is not TypeId.VARCHAR
            and t.id is not TypeId.SQLNULL):
        # string source: parse per distinct value (must run before the
        # numeric branches, which would otherwise cast the dict CODES)
        return _cast_from_varchar(c, t, try_cast=try_cast)
    if t.id is TypeId.DOUBLE:
        return Column(data=_to_double(c), ltype=t, validity=c.validity)
    if t.id is TypeId.DECIMAL:
        if c.ltype.id is TypeId.DECIMAL:
            d = c.data.astype(jnp.int64) * jnp.int64(10 ** (t.scale - c.ltype.scale))
        elif c.ltype.is_integer or c.ltype.id is TypeId.BOOLEAN:
            d = c.data.astype(jnp.int64) * jnp.int64(10**t.scale)
        else:  # float → decimal: round
            d = jnp.round(c.data.astype(jnp.float64) * (10**t.scale)).astype(jnp.int64)
        return Column(data=d, ltype=t, validity=c.validity)
    if t.is_integer:
        if c.ltype.id is TypeId.DECIMAL:
            # duckdb decimal→int casts round half away from zero
            scale = jnp.int64(10**c.ltype.scale)
            x = c.data.astype(jnp.int64)
            half = scale // 2
            d = jnp.where(x >= 0, (x + half) // scale, -((-x + half) // scale))
            d = d.astype(t.np_dtype)
        elif c.ltype.is_float:
            d = jnp.round(c.data).astype(t.np_dtype)
        else:
            d = c.data.astype(t.np_dtype)
        return Column(data=d, ltype=t, validity=c.validity)
    if t.id is TypeId.VARCHAR and c.ltype.id is TypeId.VARCHAR:
        return c
    if t.id in (TypeId.DATE, TypeId.TIMESTAMP, TypeId.TIMESTAMPTZ) \
            and c.ltype.id in (TypeId.DATE, TypeId.TIMESTAMP,
                               TypeId.TIMESTAMPTZ):
        if t.id == c.ltype.id:
            return c
        if t.id in (TypeId.TIMESTAMP, TypeId.TIMESTAMPTZ):
            if c.ltype.id is TypeId.DATE:
                # TIMESTAMPTZ is UTC micros; session TimeZone is UTC, so
                # timestamp<->timestamptz is a relabel (reference applies
                # the session offset, timezone.cpp)
                return Column(
                    data=c.data.astype(jnp.int64) * jnp.int64(86400_000_000),
                    ltype=t, validity=c.validity)
            return Column(data=c.data, ltype=t, validity=c.validity)
        return Column(
            data=(c.data // jnp.int64(86400_000_000)).astype(jnp.int32),
            ltype=t,
            validity=c.validity,
        )
    if t.id is TypeId.TIME and c.ltype.id is TypeId.VARCHAR:
        from duckdb_tpu.planner.binder import _parse_time_micros

        lut = np.array([_parse_time_micros(str(s_))
                        for s_ in c.dict_values] or [0], dtype=np.int64)
        return Column(data=jnp.asarray(lut)[jnp.clip(c.data, 0,
                                                     len(lut) - 1)],
                      ltype=t, validity=c.validity)
    if c.ltype.id is TypeId.SQLNULL:
        # NULL literal → all-null column of the target type (UNION branches
        # from GROUPING SETS desugaring produce these for rolled-up keys)
        n = c.data.shape[0]
        if t.id is TypeId.VARCHAR:
            return Column(data=jnp.zeros((n,), jnp.int32), ltype=t,
                          validity=jnp.zeros((n,), jnp.bool_),
                          dict_values=np.array([""], dtype=object))
        return Column(data=jnp.zeros((n,), t.np_dtype), ltype=t,
                      validity=jnp.zeros((n,), jnp.bool_))
    if c.ltype.id is TypeId.BIT and t.id is TypeId.VARCHAR:
        return Column(data=c.data, ltype=t, validity=c.validity,
                      dict_values=c.dict_values)
    if c.ltype.id is TypeId.LIST and t.id is TypeId.ARRAY:
        # LIST -> ARRAY(N): validate every referenced tuple's length
        dv = c.dict_values if c.dict_values is not None else []
        ok = np.array([len(e) == t.width for e in dv] or [True])
        if not ok.all():
            bad_rows = _codes_hit_bad(c, ok)
            if bad_rows and not try_cast:
                from duckdb_tpu.errors import ConversionException

                raise ConversionException(
                    f"Cannot cast list of length "
                    f"{len(dv[int(np.argmin(ok))])} to {t!r}")
            okv = jnp.asarray(ok)[jnp.clip(c.data, 0, max(len(dv) - 1, 0))]
            validity = (okv if c.validity is None
                        else jnp.logical_and(c.validity, okv))
            return Column(data=c.data, ltype=t, validity=validity,
                          dict_values=c.dict_values)
        return Column(data=c.data, ltype=t, validity=c.validity,
                      dict_values=c.dict_values)
    if c.ltype.id is TypeId.ARRAY and t.id is TypeId.LIST:
        return Column(data=c.data, ltype=t, validity=c.validity,
                      dict_values=c.dict_values)
    if t.id is TypeId.UNION and c.ltype.id is TypeId.UNION:
        # union -> union: remap tag indices by member name
        src_names = [n for n, _ in (c.ltype.fields or ())]
        dst_idx = {n.lower(): i for i, (n, _) in enumerate(t.fields or ())}
        dv = c.dict_values if c.dict_values is not None else []
        d = np.empty(max(len(dv), 1), object)
        for i, e in enumerate(dv):
            if e is None or not e:
                d[i] = e
                continue
            tag, v = e
            name = src_names[tag] if tag < len(src_names) else None
            if name is None or name.lower() not in dst_idx:
                raise BindError(
                    f"union member {name!r} not present in {t!r}")
            d[i] = (dst_idx[name.lower()], v)
        return Column(data=c.data, ltype=t, validity=c.validity,
                      dict_values=d)
    if t.id is TypeId.UNION and c.ltype.id is not TypeId.UNION:
        # member-type -> union: wrap each distinct value with the first
        # tag whose type accepts it implicitly (reference union_casts.cpp)
        from duckdb_tpu.types import implicit_cast_cost

        tag = None
        for i, (fname, ft) in enumerate(t.fields or ()):
            if ft == c.ltype or implicit_cast_cost(c.ltype, ft) is not None:
                tag = i
                break
        if tag is None:
            raise BindError(f"no union member accepts {c.ltype!r}")
        host = _host_values(c)
        seen, codes = {}, np.empty(len(host), np.int32)
        for i, v in enumerate(host):
            e = (tag, v)
            if e not in seen:
                seen[e] = len(seen)
            codes[i] = seen[e]
        d = np.empty(max(len(seen), 1), object)
        for e, i in seen.items():
            d[i] = e
        return Column(data=jnp.asarray(codes)[jnp.clip(
            c.data.astype(jnp.int32), 0, max(len(host) - 1, 0))]
            if c.dict_values is not None else jnp.asarray(codes),
            ltype=t, validity=c.validity, dict_values=d)
    if t.id is TypeId.VARCHAR:
        return _cast_to_varchar(c, env)
    if c.ltype.id is TypeId.VARCHAR:
        return _cast_from_varchar(c, t, try_cast=try_cast)
    if t.id is TypeId.BOOLEAN:
        return Column(data=c.data != 0, ltype=t, validity=c.validity)
    if t.is_float:  # FLOAT target
        return Column(data=_to_double(c).astype(t.np_dtype), ltype=t,
                      validity=c.validity)
    raise BindError(f"unsupported coercion {c.ltype} → {t}")


def format_varchar(v, t: LogicalType) -> str:
    """Render one non-NULL python-ish value as duckdb's VARCHAR cast does
    (reference: src/common/operator/string_cast.cpp)."""
    import datetime
    import decimal as pydec

    if t.id is TypeId.BOOLEAN:
        return "true" if v else "false"
    if t.id is TypeId.DECIMAL:
        return str(pydec.Decimal(int(v)).scaleb(-t.scale)) if t.scale \
            else str(int(v))
    if t.id is TypeId.DATE:
        return (datetime.date(1970, 1, 1)
                + datetime.timedelta(days=int(v))).isoformat()
    if t.id in (TypeId.TIMESTAMP, TypeId.TIMESTAMPTZ):
        dt = (datetime.datetime(1970, 1, 1)
              + datetime.timedelta(microseconds=int(v)))
        s = dt.strftime("%Y-%m-%d %H:%M:%S")
        if dt.microsecond:
            s += f".{dt.microsecond:06d}".rstrip("0")
        if t.id is TypeId.TIMESTAMPTZ:
            s += "+00"  # session TimeZone is UTC
        return s
    if t.id is TypeId.TIME:
        us = int(v)
        s = (f"{us // 3_600_000_000:02d}:{us // 60_000_000 % 60:02d}"
             f":{us // 1_000_000 % 60:02d}")
        if us % 1_000_000:
            s += f".{us % 1_000_000:06d}".rstrip("0")
        return s
    if t.is_float:
        f = float(v)
        if f != f or f in (float("inf"), float("-inf")):
            return {float("inf"): "inf", float("-inf"): "-inf"}.get(f, "nan")
        if f == int(f) and abs(f) < 1e15:
            return f"{f:.1f}"
        return repr(f)
    return str(int(v))


def _cast_to_varchar(c: Column, env) -> Column:
    """Non-VARCHAR → VARCHAR: host-side formatting + sorted dict encode.
    Concretizes the column, so under jit this raises ConcretizationTypeError
    and the caller's eager fallback runs (same contract as strftime)."""
    data = np.asarray(jnp.broadcast_to(c.data, (env.plen,)))
    valid = (np.asarray(jnp.broadcast_to(c.validity, (env.plen,)))
             if c.validity is not None else None)
    t = c.ltype
    if t.is_integer and t.id is not TypeId.BOOLEAN:
        strs = data.astype(np.int64).astype(str).astype(object)
    else:
        strs = np.array([format_varchar(v, t)
                         if valid is None or valid[i] else ""
                         for i, v in enumerate(data)], dtype=object)
    uniq, codes = np.unique(strs.astype(str), return_inverse=True)
    return Column(data=jnp.asarray(codes.astype(np.int32)),
                  ltype=VARCHAR, validity=c.validity,
                  dict_values=uniq.astype(object))


def _host_values(c: Column):
    """Distinct host values of a column: dict values when dict-encoded,
    else the concretized data (raises under jit → eager fallback, the
    _cast_to_varchar contract)."""
    if c.dict_values is not None:
        return list(c.dict_values)
    return [v for v in np.asarray(c.data).tolist()]


def _codes_hit_bad(c: Column, ok: np.ndarray) -> bool:
    """True if any VALID row references a dict entry marked not-ok."""
    try:
        codes = np.asarray(c.data)
        valid = np.asarray(c.validity) if c.validity is not None else None
        ref = codes if valid is None else codes[np.broadcast_to(
            valid, codes.shape)]
        ref = np.clip(ref, 0, max(len(ok) - 1, 0))
        return bool((~ok[ref]).any())
    except Exception:  # noqa: BLE001 (traced: defer to NULL-out)
        return c.validity is None


def _cast_from_varchar(c: Column, t: LogicalType,
                       try_cast: bool = False) -> Column:
    """VARCHAR → numeric/date/etc: parse each DISTINCT value once into a
    LUT, gather by code — dict_values are static at trace time so this
    stays fully traceable (the per-distinct host-op idiom)."""
    import datetime

    from duckdb_tpu.storage.csv import parse_decimal_text

    if t.id is TypeId.UNION:
        # VARCHAR → union: wrap into the first VARCHAR-accepting member
        for ki, (fname, ft) in enumerate(t.fields or ()):
            if ft.id is TypeId.VARCHAR:
                dv = c.dict_values if c.dict_values is not None else []
                d = np.empty(max(len(dv), 1), object)
                for i, v in enumerate(dv):
                    d[i] = (ki, str(v))
                return Column(data=c.data, ltype=t, validity=c.validity,
                              dict_values=d)
        raise BindError(f"no union member accepts VARCHAR in {t!r}")
    if t.id is TypeId.BIT:
        # bitstring text: validate 0/1 per distinct value, keep the dict
        dv = c.dict_values if c.dict_values is not None else []
        ok = np.array([len(s_) > 0 and all(ch in "01" for ch in str(s_))
                       for s_ in dv] or [True])
        if not ok.all() and not try_cast and _codes_hit_bad(c, ok):
            from duckdb_tpu.errors import ConversionException

            raise ConversionException(
                f"Could not convert string "
                f"'{dv[int(np.argmin(ok))]}' to BIT")
        validity = c.validity
        if not ok.all():
            okv = jnp.asarray(ok)[jnp.clip(c.data, 0, max(len(dv) - 1, 0))]
            validity = okv if validity is None \
                else jnp.logical_and(validity, okv)
        return Column(data=c.data, ltype=t, validity=validity,
                      dict_values=np.array([str(s_) for s_ in dv] or [""],
                                           dtype=object))
    if t.id in (TypeId.LIST, TypeId.STRUCT, TypeId.MAP, TypeId.ARRAY):
        # nested cast: parse each distinct string into a host tuple
        # (reference: src/function/cast/list_cast.cpp, struct_cast.cpp)
        from duckdb_tpu.planner.nested_cast import cast_str_to_nested

        dv = c.dict_values if c.dict_values is not None else []
        entries, ok = [], np.ones(max(len(dv), 1), bool)
        bad = None
        for i, s in enumerate(dv):
            try:
                entries.append(cast_str_to_nested(str(s), t))
            except ValueError:
                entries.append(())
                ok[i] = False
                bad = str(s)
        if bad is not None and not try_cast:
            # NULL rows carry an unparseable dict placeholder; only raise
            # when a VALID row actually references a bad entry
            strict = True
            try:
                codes = np.asarray(c.data)
                valid = (np.asarray(c.validity)
                         if c.validity is not None else None)
                ref = codes if valid is None else codes[valid]
                ref = np.clip(ref, 0, max(len(entries) - 1, 0))
                strict = bool((~ok[ref]).any()) if len(entries) else False
            except Exception:  # noqa: BLE001 (traced: defer to NULL-out)
                strict = c.validity is None
            if strict:
                from duckdb_tpu.errors import ConversionException

                raise ConversionException(
                    f"Could not convert string '{bad}' to {t!r}")
        seen: dict = {}
        codes = np.empty(len(entries), np.int32)
        for i, e in enumerate(entries):
            if e not in seen:
                seen[e] = len(seen)
            codes[i] = seen[e]
        d = np.empty(max(len(seen), 1), object)
        for e, i in seen.items():
            d[i] = e
        idx = jnp.clip(c.data, 0, max(len(entries) - 1, 0))
        data = (jnp.asarray(codes)[idx] if len(entries)
                else jnp.zeros_like(c.data))
        validity = c.validity
        if not ok.all():
            okv = jnp.asarray(ok)[idx]
            validity = okv if validity is None \
                else jnp.logical_and(validity, okv)
        return Column(data=data, ltype=t, validity=validity, dict_values=d)

    def parse(s):
        s = str(s).strip()
        if t.id is TypeId.DATE:
            return (datetime.date.fromisoformat(s)
                    - datetime.date(1970, 1, 1)).days
        if t.id is TypeId.TIMESTAMP:
            from duckdb_tpu.planner.binder import _parse_timestamp

            return _parse_timestamp(s)
        if t.id is TypeId.TIMESTAMPTZ:
            from duckdb_tpu.planner.binder import _parse_timestamptz

            return _parse_timestamptz(s)
        if t.id is TypeId.DECIMAL:
            return parse_decimal_text(s, t.scale)
        if t.id is TypeId.TIME:
            from duckdb_tpu.planner.binder import _parse_time_micros

            return _parse_time_micros(s)
        if t.id is TypeId.INTERVAL:
            raise ValueError(s)  # interval text parse: binder handles
        if t.id is TypeId.BOOLEAN:
            if s.lower() in ("true", "t", "1"):
                return 1
            if s.lower() in ("false", "f", "0"):
                return 0
            raise ValueError(s)
        if t.is_float:
            return float(s)
        if s.lstrip("+-").isdigit():
            return int(s)
        import math as _m

        f = float(s)  # duckdb accepts '1.5'::INT, rounding half away from 0
        r = _m.floor(abs(f) + 0.5)
        return r if f >= 0 else -r

    ok = np.ones(max(1, len(c.dict_values)), dtype=bool)
    vals = np.zeros(max(1, len(c.dict_values)),
                    dtype=t.np_dtype if not t.is_float else np.float64)
    bad = None
    for i, s_ in enumerate(c.dict_values if c.dict_values is not None
                           else []):
        try:
            vals[i] = parse(s_)
        except (ValueError, OverflowError):
            ok[i] = False
            bad = str(s_)
    if bad is not None and not try_cast:
        raise BindError(
            f"Conversion Error: Could not convert string '{bad}' to "
            f"{t.id.name}")
    lut = jnp.asarray(vals)
    idx = jnp.clip(c.data, 0, len(vals) - 1)
    validity = c.validity
    if bad is not None:  # TRY_CAST: unparseable values become NULL
        okv = jnp.asarray(ok)[idx]
        validity = okv if validity is None else jnp.logical_and(validity, okv)
    return Column(data=lut[idx], ltype=t, validity=validity)


@dataclass
class BoundCast(BoundExpr):
    child: BoundExpr
    ltype: LogicalType = DOUBLE
    try_cast: bool = False

    def children(self):
        return [self.child]

    def eval(self, env):
        return _coerce_to(self.child.eval(env), self.ltype, env,
                          try_cast=self.try_cast)

    def is_const(self):
        return self.child.is_const()

    def const_value(self):
        from duckdb_tpu.planner.fold import fold_cast

        return fold_cast(self)


@dataclass
class BoundLike(BoundExpr):
    """LIKE over dictionary codes: regex applied per distinct value → LUT gather."""

    child: BoundExpr
    pattern: str
    negated: bool = False
    case_insensitive: bool = False
    ltype: LogicalType = BOOLEAN

    def children(self):
        return [self.child]

    def eval(self, env: EvalEnv) -> Column:
        c = self.child.eval(env)
        assert c.ltype.id is TypeId.VARCHAR and c.dict_values is not None
        lut = None
        if len(c.dict_values) >= 1:
            from duckdb_tpu.ops import strings as dstr

            if len(c.dict_values) >= dstr.DEVICE_LIKE_MIN_DICT:
                # near-unique columns: vectorized device matching over the
                # packed dictionary byte plane instead of a Python loop per
                # distinct value (ops/strings.py); handles %, _, escapes
                lut = dstr.device_like_lut(c.dict_values, self.pattern,
                                           self.case_insensitive)
                if lut is None:
                    dstr.note_host_loop(f"like:{self.pattern}",
                                        len(c.dict_values))
        if lut is None:
            rx = like_to_regex(self.pattern)
            flags = re.IGNORECASE if self.case_insensitive else 0
            prog = re.compile(rx, flags)
            lut = np.fromiter(
                (prog.match(s) is not None for s in c.dict_values),
                dtype=np.bool_,
                count=len(c.dict_values),
            )
        if self.negated:
            lut = ~lut
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, len(lut) - 1)]
        return Column(data=d, ltype=BOOLEAN, validity=c.validity)


def like_to_regex(pattern: str) -> str:
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 1
        else:
            out.append(re.escape(ch))
        i += 1
    return "".join(out) + r"\Z"


@dataclass
class BoundInList(BoundExpr):
    child: BoundExpr
    items: List[BoundExpr]  # all constant-foldable or general exprs
    negated: bool = False
    ltype: LogicalType = BOOLEAN

    def children(self):
        return [self.child] + self.items

    def eval(self, env: EvalEnv) -> Column:
        c = self.child.eval(env)
        if c.ltype.id is TypeId.VARCHAR:
            vals = set()
            for it in self.items:
                v = it.const_value()
                if v is not None:
                    vals.add(v)
            lut = np.isin(c.dict_values, np.array(sorted(vals), dtype=object))
            if self.negated:
                lut = ~lut
            d = jnp.asarray(lut)[jnp.clip(c.data, 0, len(lut) - 1)]
            return Column(data=d, ltype=BOOLEAN, validity=c.validity)
        d = jnp.zeros((env.plen,), jnp.bool_)
        for it in self.items:
            ic = it.eval(env)
            x, y = _common_numeric(c, ic)
            d = jnp.logical_or(d, x == y)
        if self.negated:
            d = jnp.logical_not(d)
        return Column(data=d, ltype=BOOLEAN, validity=c.validity)


@dataclass
class BoundFunction(BoundExpr):
    name: str
    args: List[BoundExpr]
    ltype: LogicalType = DOUBLE
    impl: Optional[Callable] = None  # (env, arg_columns) -> Column

    def children(self):
        return self.args

    def eval(self, env: EvalEnv) -> Column:
        cols = [a.eval(env) for a in self.args]
        try:
            return self.impl(env, cols, self)
        except IndexError:
            # an impl indexing past its argument list = caller arity
            # mismatch the binder didn't pre-check — a USER error
            raise BindError(
                f"Binder Error: wrong number of arguments to {self.name}")


@dataclass
class BoundAggregateRef(BoundExpr):
    """Reference to an aggregate's output slot (post-grouping column)."""

    key: str
    ltype: LogicalType = DOUBLE

    def eval(self, env: EvalEnv) -> Column:
        return env.cols[self.key]


@dataclass
class BoundAggregate:
    """One aggregate to compute: func over arg expressions (pre-grouping)."""

    func: str  # sum/count/avg/min/max/count_star/...
    args: List[BoundExpr]
    distinct: bool
    ltype: LogicalType  # result type
    key: str  # output binding
    # ORDER BY inside the call (first/last/string_agg):
    order_by: List = field(default_factory=list)  # (BoundExpr, desc, nf)


def walk(expr: BoundExpr):
    yield expr
    for c in expr.children():
        yield from walk(c)
