"""Scalar function registry.

Parity model: the reference registers 201 in-tree + 383 core_functions
entries (/root/reference/src/function/function_list.cpp,
extension/core_functions/function_list.cpp). This registry grows toward
that set; each entry is (bind → result type, impl over evaluated Columns).

String functions run on the host dictionary (once per distinct value) and
become a device LUT remap — O(|dict|) host work instead of O(rows).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from duckdb_tpu.blocks import Column
from duckdb_tpu.planner.bound import (
    BindError,
    BoundFunction,
    EvalEnv,
    _and_validity,
    _coerce_to,
    _to_double,
    civil_from_days,
)
from duckdb_tpu.types import (
    BIGINT,
    BOOLEAN,
    DATE,
    DOUBLE,
    INTEGER,
    VARCHAR,
    LogicalType,
    TypeId,
    decimal,
    max_logical_type,
)


def dict_transform(col: Column, fn, device=None, device_key=None) -> Column:
    """Apply a string→string fn per distinct value; re-encode codes.

    When `device` is given (a plane op from ops/strings.py) and the
    dictionary is large, the transform runs vectorized on device and only
    distinct RESULTS are decoded; the host per-value loop is the
    low-cardinality / non-ASCII fallback."""
    if col.dict_values is None:
        if col.ltype.id not in (TypeId.VARCHAR, TypeId.BLOB, TypeId.BIT,
                                TypeId.SQLNULL):
            from duckdb_tpu.planner.bound import BindError

            raise BindError(
                f"Binder Error: string function over {col.ltype!r} "
                "argument (no implicit cast)")
        # typed-NULL input (e.g. fn(NULL))
        return Column(data=jnp.zeros_like(col.data), ltype=VARCHAR,
                      validity=jnp.zeros(col.data.shape, jnp.bool_),
                      dict_values=np.array([""], dtype=object))
    from duckdb_tpu.ops import strings as dstr

    nd = len(col.dict_values)
    if device is not None and nd >= dstr.DEVICE_STR_MIN_DICT:
        res = dstr.device_transform_lut(col.dict_values, device_key, device)
        if res is not None:
            remap, uniq = res
            codes = jnp.asarray(remap)[jnp.clip(col.data, 0, nd - 1)]
            return Column(data=codes, ltype=VARCHAR, validity=col.validity,
                          dict_values=uniq)
    dstr.note_host_loop(device_key or getattr(fn, "__name__", "transform"),
                        nd)
    new_vals = np.array([fn(s) for s in col.dict_values], dtype=object)
    uniq, inv = np.unique(new_vals.astype(str), return_inverse=True)
    lut = jnp.asarray(inv.astype(np.int32))
    codes = lut[jnp.clip(col.data, 0, nd - 1)]
    return Column(data=codes, ltype=VARCHAR, validity=col.validity,
                  dict_values=uniq.astype(object))


def dict_predicate(col: Column, fn, device=None, device_key=None) -> Column:
    """Per-distinct-value predicate → device boolean via LUT gather.
    `device` (plane op) evaluates the LUT on device for large dicts."""
    if col.dict_values is None:  # typed-NULL input
        return Column(data=jnp.zeros(col.data.shape, jnp.bool_),
                      ltype=BOOLEAN,
                      validity=jnp.zeros(col.data.shape, jnp.bool_))
    from duckdb_tpu.ops import strings as dstr

    nd = len(col.dict_values)
    lut = None
    if device is not None and nd >= dstr.DEVICE_STR_MIN_DICT:
        lut = dstr.device_value_lut(col.dict_values, device_key, device)
    if lut is None:
        dstr.note_host_loop(device_key or getattr(fn, "__name__", "pred"), nd)
        lut = np.fromiter((fn(s) for s in col.dict_values), dtype=np.bool_,
                          count=nd)
    d = jnp.asarray(lut)[jnp.clip(col.data, 0, len(lut) - 1)]
    return Column(data=d, ltype=BOOLEAN, validity=col.validity)


def dict_int(col: Column, fn, device=None, device_key=None) -> Column:
    """Per-distinct-value int fn → BIGINT column via LUT gather, device
    plane op when available."""
    if col.dict_values is None:  # typed-NULL input
        return Column(data=jnp.zeros(col.data.shape, jnp.int64),
                      ltype=BIGINT,
                      validity=jnp.zeros(col.data.shape, jnp.bool_))
    from duckdb_tpu.ops import strings as dstr

    nd = len(col.dict_values)
    lut = None
    if device is not None and nd >= dstr.DEVICE_STR_MIN_DICT:
        lut = dstr.device_value_lut(col.dict_values, device_key, device)
        if lut is not None:
            lut = lut.astype(np.int64)
    if lut is None:
        dstr.note_host_loop(device_key or getattr(fn, "__name__", "int"), nd)
        lut = np.fromiter((fn(s) for s in col.dict_values), dtype=np.int64,
                          count=nd)
    d = jnp.asarray(lut)[jnp.clip(col.data, 0, len(lut) - 1)]
    return Column(data=d, ltype=BIGINT, validity=col.validity)


# -- date part extraction ----------------------------------------------------
def _extract_impl(part: str):
    def impl(env: EvalEnv, cols, node):
        c = cols[0]
        if c.ltype.id is TypeId.TIME or part in ("hour", "minute", "second",
                                                 "millisecond",
                                                 "microsecond"):
            us = (c.data.astype(jnp.int64)
                  if c.ltype.id is TypeId.TIME
                  else c.data.astype(jnp.int64) % jnp.int64(86400_000_000))
            if part == "hour":
                out = us // jnp.int64(3_600_000_000)
            elif part == "minute":
                out = us // jnp.int64(60_000_000) % 60
            elif part == "second":
                out = us // jnp.int64(1_000_000) % 60
            elif part == "millisecond":
                out = us // jnp.int64(1_000) % 60_000
            else:
                out = us % jnp.int64(60_000_000)
            return Column(data=out, ltype=BIGINT, validity=c.validity)
        if c.ltype.id is TypeId.TIMESTAMP:
            days = c.data // jnp.int64(86400_000_000)
        else:
            days = c.data.astype(jnp.int64)
        y, m, d = civil_from_days(days)
        if part == "year":
            out = y
        elif part == "month":
            out = m
        elif part == "day":
            out = d
        elif part == "quarter":
            out = (m - 1) // 3 + 1
        elif part == "decade":
            out = jnp.where(y >= 0, y // 10, -((-y + 9) // 10))
        elif part == "century":
            out = jnp.where(y > 0, (y + 99) // 100, -((-y + 100) // 100) + 1)
        elif part in ("dow", "dayofweek"):
            out = jnp.mod(days + 4, 7)  # 1970-01-01 was Thursday; Sunday=0
        elif part in ("doy", "dayofyear"):
            out = d + _days_before_month(y, m)
        else:
            raise BindError(f"unsupported extract part {part}")
        return Column(data=out.astype(jnp.int64), ltype=BIGINT, validity=c.validity)

    return impl


def _days_before_month(y, m):
    cum = jnp.asarray([0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334],
                      dtype=jnp.int64)
    leap = ((y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))).astype(jnp.int64)
    return cum[m - 1] + jnp.where(m > 2, leap, 0)


# -- registry ---------------------------------------------------------------
# name → bind(arg_types) -> (result_type, impl(env, cols, node) -> Column)
REGISTRY = {}


def register(name):
    def deco(fn):
        REGISTRY[name] = fn
        return fn

    return deco


@register("extract")
@register("date_part")
def _bind_extract(arg_exprs):
    # first arg is the part name literal
    part = arg_exprs[0].const_value()
    return BIGINT, _extract_impl(str(part).lower()), arg_exprs[1:]


for _p in ("year", "month", "day", "quarter", "decade", "century", "dayofweek",
           "dayofyear", "doy", "dow", "hour", "minute", "second",
           "millisecond", "microsecond"):
    def _mk(p):
        def b(arg_exprs):
            return BIGINT, _extract_impl(p), arg_exprs
        return b
    REGISTRY[_p] = _mk(_p)


@register("substring")
@register("substr")
def _bind_substring(arg_exprs):
    start = arg_exprs[1].const_value()
    length = arg_exprs[2].const_value() if len(arg_exprs) > 2 else None

    def impl(env, cols, node):
        from duckdb_tpu.ops import strings as dstr

        c = cols[0]
        s0 = int(start) - 1
        ln = None if length is None else int(length)
        dev = None
        if s0 >= 0 and (ln is None or ln >= 0):
            dev = lambda p, le: dstr.op_substring(p, le, s0, ln)  # noqa: E731
        if length is None:
            return dict_transform(c, lambda s: s[s0:], device=dev,
                                  device_key=f"substr:{s0}:")
        return dict_transform(c, lambda s: s[s0:s0 + int(length)],
                              device=dev, device_key=f"substr:{s0}:{ln}")

    return VARCHAR, impl, arg_exprs[:1]


def _case_impl(upper: bool):
    from duckdb_tpu.ops import strings as dstr

    def impl(env, cols, node):
        return dict_transform(
            cols[0], str.upper if upper else str.lower,
            device=lambda p, le: dstr.op_case(p, le, upper),
            device_key=f"case:{upper}")
    return impl


REGISTRY["upper"] = REGISTRY["ucase"] = \
    lambda arg_exprs: (VARCHAR, _case_impl(True), arg_exprs)
REGISTRY["lower"] = REGISTRY["lcase"] = \
    lambda arg_exprs: (VARCHAR, _case_impl(False), arg_exprs)


def _trim_bind(left: bool, right: bool, host_fn):
    def bind(arg_exprs):
        from duckdb_tpu.ops import strings as dstr

        chars = " "
        if len(arg_exprs) > 1:
            chars = str(arg_exprs[1].const_value())
        try:
            cb = chars.encode("ascii")
            dev = lambda p, le: dstr.op_trim(p, le, cb, left, right)  # noqa: E731
        except UnicodeEncodeError:
            dev = None

        def impl(env, cols, node):
            return dict_transform(cols[0], lambda s: host_fn(s, chars),
                                  device=dev,
                                  device_key=f"trim:{left}:{right}:{chars}")
        return VARCHAR, impl, arg_exprs[:1]
    return bind


REGISTRY["trim"] = _trim_bind(True, True, lambda s, c: s.strip(c))
REGISTRY["ltrim"] = _trim_bind(True, False, lambda s, c: s.lstrip(c))
REGISTRY["rtrim"] = _trim_bind(False, True, lambda s, c: s.rstrip(c))


@register("length")
@register("len")
@register("strlen")
def _bind_length(arg_exprs):
    def impl(env, cols, node):
        return dict_int(cols[0], len, device=lambda p, le: le,
                        device_key="len")

    return BIGINT, impl, arg_exprs


@register("contains")
def _bind_contains(arg_exprs):
    from duckdb_tpu.ops import strings as dstr

    needle = arg_exprs[1].const_value()

    def impl(env, cols, node):
        dev = None
        if isinstance(needle, str) and needle.isascii():
            dev = lambda p, le: dstr.op_contains(p, le, needle)  # noqa: E731
        return dict_predicate(cols[0], lambda s: needle in s, device=dev,
                              device_key=f"contains:{needle}")

    return BOOLEAN, impl, arg_exprs[:1]


@register("starts_with")
@register("prefix")
def _bind_starts_with(arg_exprs):
    from duckdb_tpu.ops import strings as dstr

    pre = arg_exprs[1].const_value()

    def impl(env, cols, node):
        dev = None
        if isinstance(pre, str) and pre.isascii():
            dev = lambda p, le: dstr.op_prefix(p, le, pre)  # noqa: E731
        return dict_predicate(cols[0], lambda s: s.startswith(pre),
                              device=dev, device_key=f"prefix:{pre}")

    return BOOLEAN, impl, arg_exprs[:1]


@register("abs")
def _bind_abs(arg_exprs):
    t = arg_exprs[0].ltype

    def impl(env, cols, node):
        c = cols[0]
        return Column(data=jnp.abs(c.data), ltype=t, validity=c.validity)

    return t, impl, arg_exprs


@register("round")
def _bind_round(arg_exprs):
    t = arg_exprs[0].ltype
    _ndv = arg_exprs[1].const_value() if len(arg_exprs) > 1 else 0
    if _ndv is None:
        # round(x, NULL) → NULL (reference NULL propagation)
        def impl(env, cols, node):
            c = cols[0]
            return Column(data=jnp.zeros(c.data.shape, jnp.float64),
                          ltype=DOUBLE,
                          validity=jnp.zeros(c.data.shape, jnp.bool_))
        return DOUBLE, impl, arg_exprs[:1]
    nd = int(_ndv)
    if t.id is TypeId.DECIMAL:
        rt = decimal(t.width, min(t.scale, nd))

        def impl(env, cols, node):
            c = cols[0]
            drop = 10 ** (t.scale - rt.scale)
            if drop == 1:
                return c
            x = c.data.astype(jnp.int64)
            half = drop // 2
            d = jnp.where(x >= 0, (x + half) // drop, -((-x + half) // drop))
            return Column(data=d, ltype=rt, validity=c.validity)

        return rt, impl, arg_exprs[:1]

    def impl(env, cols, node):
        c = cols[0]
        scale = 10.0**nd
        x = _to_double(c) * scale
        # duckdb rounds half away from zero (not banker's rounding)
        d = jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5) / scale
        return Column(data=d, ltype=DOUBLE, validity=c.validity)

    return DOUBLE, impl, arg_exprs[:1]


@register("floor")
def _bind_floor(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jnp.floor(_to_double(cols[0])), ltype=DOUBLE,
                      validity=cols[0].validity)
    return DOUBLE, impl, arg_exprs


@register("ceil")
@register("ceiling")
def _bind_ceil(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jnp.ceil(_to_double(cols[0])), ltype=DOUBLE,
                      validity=cols[0].validity)
    return DOUBLE, impl, arg_exprs


@register("sqrt")
def _bind_sqrt(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jnp.sqrt(_to_double(cols[0])), ltype=DOUBLE,
                      validity=cols[0].validity)
    return DOUBLE, impl, arg_exprs


@register("coalesce")
def _bind_coalesce(arg_exprs):
    t = arg_exprs[0].ltype
    for a in arg_exprs[1:]:
        if a.ltype.id is not TypeId.SQLNULL:
            t = max_logical_type(t, a.ltype)

    def impl(env, cols, node):
        acc = _coerce_to(cols[-1], t, env)
        data = jnp.broadcast_to(acc.data, (env.plen,))
        valid = (jnp.broadcast_to(acc.validity, (env.plen,))
                 if acc.validity is not None else jnp.ones((env.plen,), jnp.bool_))
        for c in reversed(cols[:-1]):
            cc = _coerce_to(c, t, env)
            cv = (jnp.broadcast_to(cc.validity, (env.plen,))
                  if cc.validity is not None else jnp.ones((env.plen,), jnp.bool_))
            data = jnp.where(cv, jnp.broadcast_to(cc.data, (env.plen,)), data)
            valid = jnp.logical_or(cv, valid)
        return Column(data=data, ltype=t, validity=valid)

    return t, impl, arg_exprs
