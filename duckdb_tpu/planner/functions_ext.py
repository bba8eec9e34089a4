"""Extended scalar function library.

Parity model: the reference's core_functions extension (383 functions,
/root/reference/extension/core_functions/function_list.cpp) on top of the
201 in-tree registrations. Math is fused VPU elementwise ops; strings run
once per distinct dictionary value; date functions use the on-device civil
calendar math.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_tpu.blocks import Column
from duckdb_tpu.planner.bound import (
    BindError, _and_validity, _coerce_to, _to_double, civil_from_days,
)
from duckdb_tpu.planner.functions import (
    REGISTRY, register, dict_transform, dict_predicate, _days_before_month,
)
from duckdb_tpu.types import (
    BIGINT, BOOLEAN, DATE, DOUBLE, INTEGER, TIMESTAMP, VARCHAR,
    LogicalType, TypeId, decimal, max_logical_type,
)


# -- math --------------------------------------------------------------------
def _unary_math(name, fn):
    def bind(arg_exprs):
        def impl(env, cols, node):
            return Column(data=fn(_to_double(cols[0])), ltype=DOUBLE,
                          validity=cols[0].validity)
        return DOUBLE, impl, arg_exprs
    REGISTRY[name] = bind


for _n, _f in [
    ("ln", jnp.log), ("log2", jnp.log2), ("log10", jnp.log10),
    ("log", jnp.log10),  # duckdb: log(x) is log10
    ("exp", jnp.exp), ("sin", jnp.sin), ("cos", jnp.cos), ("tan", jnp.tan),
    ("asin", jnp.arcsin), ("acos", jnp.arccos), ("atan", jnp.arctan),
    ("sinh", jnp.sinh), ("cosh", jnp.cosh), ("tanh", jnp.tanh),
    ("degrees", jnp.degrees), ("radians", jnp.radians),
    ("cbrt", jnp.cbrt),
]:
    _unary_math(_n, _f)


@register("pow")
@register("power")
def _bind_pow(arg_exprs):
    def impl(env, cols, node):
        d = jnp.power(_to_double(cols[0]), _to_double(cols[1]))
        return Column(data=d, ltype=DOUBLE,
                      validity=_and_validity(cols[0].validity,
                                             cols[1].validity))
    return DOUBLE, impl, arg_exprs


@register("atan2")
def _bind_atan2(arg_exprs):
    def impl(env, cols, node):
        d = jnp.arctan2(_to_double(cols[0]), _to_double(cols[1]))
        return Column(data=d, ltype=DOUBLE,
                      validity=_and_validity(cols[0].validity,
                                             cols[1].validity))
    return DOUBLE, impl, arg_exprs


@register("pi")
def _bind_pi(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jnp.full((env.plen,), jnp.pi), ltype=DOUBLE)
    return DOUBLE, impl, arg_exprs


@register("sign")
def _bind_sign(arg_exprs):
    t = arg_exprs[0].ltype

    def impl(env, cols, node):
        c = cols[0]
        if t.is_float:
            d = jnp.sign(c.data)
        else:
            d = jnp.sign(c.data.astype(jnp.int64))
        return Column(data=d.astype(jnp.int32), ltype=INTEGER,
                      validity=c.validity)
    return INTEGER, impl, arg_exprs


@register("greatest")
def _bind_greatest(arg_exprs):
    return _least_greatest(arg_exprs, jnp.maximum)


@register("least")
def _bind_least(arg_exprs):
    return _least_greatest(arg_exprs, jnp.minimum)


def _least_greatest(arg_exprs, op):
    t = arg_exprs[0].ltype
    for a in arg_exprs[1:]:
        t = max_logical_type(t, a.ltype)

    def impl(env, cols, node):
        # duckdb skips NULL arguments; NULL only when every arg is NULL
        acc = None
        any_valid = None
        for c in cols:
            cc = _coerce_to(c, t, env)
            d = jnp.broadcast_to(cc.data, (env.plen,))
            v = (jnp.broadcast_to(cc.validity, (env.plen,))
                 if cc.validity is not None
                 else jnp.ones((env.plen,), jnp.bool_))
            if acc is None:
                acc = d
                any_valid = v
            else:
                both = jnp.logical_and(any_valid, v)
                acc = jnp.where(both, op(acc, d),
                                jnp.where(v, d, acc))
                any_valid = jnp.logical_or(any_valid, v)
        return Column(data=acc, ltype=t, validity=any_valid)
    return t, impl, arg_exprs


@register("gamma")
def _bind_gamma(arg_exprs):
    def impl(env, cols, node):
        d = jnp.exp(jax.lax.lgamma(_to_double(cols[0])))
        return Column(data=d, ltype=DOUBLE, validity=cols[0].validity)
    return DOUBLE, impl, arg_exprs


@register("lgamma")
def _bind_lgamma(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jax.lax.lgamma(_to_double(cols[0])), ltype=DOUBLE,
                      validity=cols[0].validity)
    return DOUBLE, impl, arg_exprs


@register("even")
def _bind_even(arg_exprs):
    def impl(env, cols, node):
        x = _to_double(cols[0])
        d = jnp.where(x >= 0, jnp.ceil(x / 2) * 2, jnp.floor(x / 2) * 2)
        return Column(data=d, ltype=DOUBLE, validity=cols[0].validity)
    return DOUBLE, impl, arg_exprs


@register("factorial")
def _bind_factorial(arg_exprs):
    def impl(env, cols, node):
        lut = jnp.asarray([math.factorial(i) for i in range(21)],
                          dtype=jnp.int64)
        x = jnp.clip(cols[0].data.astype(jnp.int32), 0, 20)
        return Column(data=lut[x], ltype=BIGINT, validity=cols[0].validity)
    return BIGINT, impl, arg_exprs


# -- conditionals ------------------------------------------------------------
@register("nullif")
def _bind_nullif(arg_exprs):
    t = arg_exprs[0].ltype

    def impl(env, cols, node):
        from duckdb_tpu.planner.bound import BoundComparison

        a, b = cols
        x, y = a, _coerce_to(b, t, env) if b.ltype != t else b
        eq = jnp.broadcast_to(x.data, (env.plen,)) == jnp.broadcast_to(
            y.data, (env.plen,))
        base = (jnp.broadcast_to(a.validity, (env.plen,))
                if a.validity is not None else jnp.ones((env.plen,), bool))
        return Column(data=jnp.broadcast_to(a.data, (env.plen,)), ltype=t,
                      validity=jnp.logical_and(base, jnp.logical_not(eq)),
                      dict_values=a.dict_values)
    return t, impl, arg_exprs


@register("ifnull")
def _bind_ifnull(arg_exprs):
    return REGISTRY["coalesce"](arg_exprs)


@register("if")
@register("iif")
def _bind_if(arg_exprs):
    t = arg_exprs[1].ltype
    if arg_exprs[2].ltype.id is not TypeId.SQLNULL:
        t = max_logical_type(t, arg_exprs[2].ltype)

    def impl(env, cols, node):
        cond, a, b = cols
        take = jnp.broadcast_to(cond.data.astype(jnp.bool_), (env.plen,))
        if cond.validity is not None:
            take = jnp.logical_and(take, jnp.broadcast_to(cond.validity,
                                                          (env.plen,)))
        ca = _coerce_to(a, t, env)
        cb = _coerce_to(b, t, env)
        dvals = None
        if t.id is TypeId.VARCHAR:
            from duckdb_tpu.planner.bound import varchar_where

            d, dvals = varchar_where(take, ca, cb, env.plen)
        else:
            d = jnp.where(take, jnp.broadcast_to(ca.data, (env.plen,)),
                          jnp.broadcast_to(cb.data, (env.plen,)))
        va = (jnp.broadcast_to(ca.validity, (env.plen,))
              if ca.validity is not None else jnp.ones((env.plen,), bool))
        vb = (jnp.broadcast_to(cb.validity, (env.plen,))
              if cb.validity is not None else jnp.ones((env.plen,), bool))
        return Column(data=d, ltype=t, validity=jnp.where(take, va, vb),
                      dict_values=dvals)
    return t, impl, arg_exprs


# -- strings (device plane ops; host per-distinct loop as fallback) ----------
def _str_transform(name, fn_builder, nconst=0, dev_builder=None):
    def bind(arg_exprs):
        if len(arg_exprs) < 1 + nconst:
            from duckdb_tpu.planner.bound import BindError

            raise BindError(
                f"Binder Error: {name} requires {1 + nconst} arguments, "
                f"{len(arg_exprs)} given")
        consts = [a.const_value() for a in arg_exprs[1:1 + nconst]]
        if any(c is None for c in consts):
            # NULL modifier argument → NULL result (SQL propagation)
            def impl(env, cols, node):
                c = cols[0]
                return Column(data=jnp.zeros_like(c.data), ltype=VARCHAR,
                              validity=jnp.zeros(c.data.shape, jnp.bool_),
                              dict_values=np.array([""], dtype=object))
            return VARCHAR, impl, arg_exprs[:1]
        fn = fn_builder(*consts)
        dev = None
        if dev_builder is not None:
            try:
                dev = dev_builder(*consts)
            except Exception:  # non-ASCII / unsupported consts → host
                dev = None
        dkey = f"{name}:{consts!r}"

        def impl(env, cols, node):
            return dict_transform(cols[0], fn, device=dev, device_key=dkey)
        return VARCHAR, impl, arg_exprs[:1]
    REGISTRY[name] = bind


def _dev(opname):
    from duckdb_tpu.ops import strings as dstr

    return getattr(dstr, opname)


_str_transform("reverse", lambda: lambda s: s[::-1],
               dev_builder=lambda: _dev("op_reverse"))
_str_transform("left", lambda n: lambda s: s[:int(n)] if n >= 0 else s[:len(s) + int(n)], 1,
               dev_builder=lambda n: lambda p, le: _dev("op_left")(p, le, int(n)))
_str_transform("right", lambda n: lambda s: s[-int(n):] if n > 0 else s[len(s) and -int(-n) or len(s):], 1,
               dev_builder=lambda n: lambda p, le: _dev("op_right")(p, le, int(n)))
_str_transform("lpad", lambda n, p=" ": lambda s: _host_pad(s, int(n), p, True), 2,
               dev_builder=lambda n, p=" ": lambda pl, le: _dev("op_pad")(pl, le, int(n), str(p), True))
_str_transform("rpad", lambda n, p=" ": lambda s: _host_pad(s, int(n), p, False), 2,
               dev_builder=lambda n, p=" ": lambda pl, le: _dev("op_pad")(pl, le, int(n), str(p), False))
_str_transform("repeat", lambda n: lambda s: s * int(n), 1,
               dev_builder=lambda n: lambda p, le: _dev("op_repeat")(p, le, int(n)))
_str_transform("replace", lambda a, b: lambda s: s.replace(a, b), 2)
_str_transform("split_part",
               lambda sep, i: lambda s: (s.split(sep)[int(i) - 1]
                                         if 0 < int(i) <= len(s.split(sep))
                                         else ""), 2)
_str_transform("initcap", lambda: lambda s: s[:1].upper() + s[1:].lower(),
               dev_builder=lambda: _dev("op_initcap"))
_str_transform("md5", lambda: lambda s: __import__("hashlib").md5(
    s.encode()).hexdigest())


def _host_pad(s: str, n: int, p: str, left: bool) -> str:
    """duckdb lpad/rpad: cycle the pad string, truncate the result to n."""
    if n <= 0:
        return ""
    if len(s) >= n or not p:
        return s[:n]
    fill = (p * n)[:n - len(s)]
    return (fill + s) if left else (s + fill)


@register("concat_ws")
def _bind_concat_ws(arg_exprs):
    sep = arg_exprs[0].const_value()

    def impl(env, cols, node):
        # all-constant fast path; general case needs row-wise concat
        if all(c.dict_values is not None and len(c.dict_values) == 1
               for c in cols):
            s = sep.join(c.dict_values[0] for c in cols)
            vals = np.array([s], dtype=object)
            return Column(data=jnp.zeros((env.plen,), jnp.int32),
                          ltype=VARCHAR, dict_values=vals)
        raise BindError("concat_ws over non-constant columns unsupported")
    return VARCHAR, impl, arg_exprs[1:]


@register("strpos")
@register("position")
@register("instr")
def _bind_strpos(arg_exprs):
    from duckdb_tpu.planner.functions import dict_int

    needle = arg_exprs[1].const_value()
    if needle is not None and not isinstance(needle, str):
        from duckdb_tpu.planner.bound import format_varchar

        needle = format_varchar(needle, arg_exprs[1].ltype)

    def impl(env, cols, node):
        dev = None
        if isinstance(needle, str) and needle.isascii():
            dev = lambda p, le: _dev("op_strpos")(p, le, needle)  # noqa: E731
        return dict_int(cols[0], lambda s: s.find(needle) + 1, device=dev,
                        device_key=f"strpos:{needle}")
    return BIGINT, impl, arg_exprs[:1]


@register("ascii")
def _bind_ascii(arg_exprs):
    from duckdb_tpu.planner.functions import dict_int

    def impl(env, cols, node):
        return dict_int(cols[0], lambda s: ord(s[0]) if s else 0,
                        device=_dev("op_ascii"), device_key="ascii")
    return BIGINT, impl, arg_exprs


@register("chr")
def _bind_chr(arg_exprs):
    code = arg_exprs[0].const_value()

    def impl(env, cols, node):
        vals = np.array([chr(int(code))], dtype=object)
        return Column(data=jnp.zeros((env.plen,), jnp.int32), ltype=VARCHAR,
                      dict_values=vals)
    return VARCHAR, impl, []


@register("regexp_matches")
def _bind_regexp_matches(arg_exprs):
    import re

    pat = re.compile(str(arg_exprs[1].const_value()))

    def impl(env, cols, node):
        return dict_predicate(cols[0], lambda s: pat.search(s) is not None)
    return BOOLEAN, impl, arg_exprs[:1]


@register("regexp_replace")
def _bind_regexp_replace(arg_exprs):
    import re

    pat = re.compile(str(arg_exprs[1].const_value()))
    repl = str(arg_exprs[2].const_value())

    def impl(env, cols, node):
        return dict_transform(cols[0], lambda s: pat.sub(repl, s, count=1))
    return VARCHAR, impl, arg_exprs[:1]


@register("regexp_extract")
def _bind_regexp_extract(arg_exprs):
    import re

    pat = re.compile(str(arg_exprs[1].const_value()))
    grp = int(arg_exprs[2].const_value()) if len(arg_exprs) > 2 else 0

    def impl(env, cols, node):
        def f(s):
            m = pat.search(s)
            return m.group(grp) if m else ""
        return dict_transform(cols[0], f)
    return VARCHAR, impl, arg_exprs[:1]


@register("ends_with")
@register("suffix")
def _bind_ends_with(arg_exprs):
    suf = arg_exprs[1].const_value()

    def impl(env, cols, node):
        dev = None
        if isinstance(suf, str) and suf.isascii():
            dev = lambda p, le: _dev("op_suffix")(p, le, suf)  # noqa: E731
        return dict_predicate(cols[0], lambda s: s.endswith(suf),
                              device=dev, device_key=f"suffix:{suf}")
    return BOOLEAN, impl, arg_exprs[:1]


# -- dates -------------------------------------------------------------------
@register("date_trunc")
@register("datetrunc")
def _bind_date_trunc(arg_exprs):
    part = str(arg_exprs[0].const_value()).lower()
    src_t = arg_exprs[1].ltype

    def impl(env, cols, node):
        c = cols[0]
        if c.ltype.id is TypeId.TIMESTAMP:
            days = c.data // jnp.int64(86400_000_000)
        else:
            days = c.data.astype(jnp.int64)
        y, m, d = civil_from_days(days)
        if part == "year":
            out_days = days - (d - 1) - _days_before_month(y, m)
        elif part == "quarter":
            qm = ((m - 1) // 3) * 3 + 1
            out_days = days - (d - 1) - (_days_before_month(y, m)
                                         - _days_before_month(y, qm))
        elif part == "month":
            out_days = days - (d - 1)
        elif part == "week":
            dow = jnp.mod(days + 3, 7)  # Monday = 0
            out_days = days - dow
        elif part == "day":
            out_days = days
        else:
            raise BindError(f"date_trunc part {part}")
        # reference returns TIMESTAMP from date_trunc
        return Column(data=out_days.astype(jnp.int64) * jnp.int64(86400_000_000),
                      ltype=TIMESTAMP, validity=c.validity)
    return TIMESTAMP, impl, arg_exprs[1:]


@register("last_day")
def _bind_last_day(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        days = c.data.astype(jnp.int64)
        y, m, d = civil_from_days(days)
        ny = jnp.where(m == 12, y + 1, y)
        nm = jnp.where(m == 12, 1, m + 1)
        first_next = _civil_to_days(ny, nm, 1)
        return Column(data=(first_next - 1).astype(jnp.int32), ltype=DATE,
                      validity=c.validity)
    return DATE, impl, arg_exprs


def _civil_to_days(y, m, d):
    y = jnp.where(m <= 2, y - 1, y)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


@register("make_date")
def _bind_make_date(arg_exprs):
    def impl(env, cols, node):
        y = cols[0].data.astype(jnp.int64)
        m = cols[1].data.astype(jnp.int64)
        d = cols[2].data.astype(jnp.int64)
        v = None
        for c in cols:
            v = _and_validity(v, c.validity)
        return Column(data=_civil_to_days(y, m, d).astype(jnp.int32),
                      ltype=DATE, validity=v)
    return DATE, impl, arg_exprs


@register("date_diff")
@register("datediff")
def _bind_date_diff(arg_exprs):
    part = str(arg_exprs[0].const_value()).lower()

    def impl(env, cols, node):
        a, b = cols
        da = a.data.astype(jnp.int64)
        db = b.data.astype(jnp.int64)
        if part in ("day", "days"):
            d = db - da
        elif part in ("year", "years"):
            ya, _, _ = civil_from_days(da)
            yb, _, _ = civil_from_days(db)
            d = yb - ya
        elif part in ("month", "months"):
            ya, ma, _ = civil_from_days(da)
            yb, mb, _ = civil_from_days(db)
            d = (yb - ya) * 12 + (mb - ma)
        elif part in ("week", "weeks"):
            d = db // 7 - da // 7
        else:
            raise BindError(f"date_diff part {part}")
        return Column(data=d, ltype=BIGINT,
                      validity=_and_validity(a.validity, b.validity))
    return BIGINT, impl, arg_exprs[1:]


@register("dayname")
def _bind_dayname(arg_exprs):
    names = np.array(["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
                      "Friday", "Saturday"], dtype=object)

    def impl(env, cols, node):
        c = cols[0]
        dow = jnp.mod(c.data.astype(jnp.int64) + 4, 7)
        order = np.argsort(names.astype(str))
        sorted_names = names[order]
        remap = jnp.asarray(np.argsort(order).astype(np.int32))
        return Column(data=remap[dow], ltype=VARCHAR, validity=c.validity,
                      dict_values=sorted_names)
    return VARCHAR, impl, arg_exprs


@register("monthname")
def _bind_monthname(arg_exprs):
    names = np.array(["January", "February", "March", "April", "May", "June",
                      "July", "August", "September", "October", "November",
                      "December"], dtype=object)

    def impl(env, cols, node):
        c = cols[0]
        _, m, _ = civil_from_days(c.data.astype(jnp.int64))
        order = np.argsort(names.astype(str))
        remap = jnp.asarray(np.argsort(order).astype(np.int32))
        return Column(data=remap[m - 1], ltype=VARCHAR, validity=c.validity,
                      dict_values=names[order])
    return VARCHAR, impl, arg_exprs


@register("current_date")
@register("today")
def _bind_current_date(arg_exprs):
    import datetime

    _mark_nondeterministic()
    if REPLAY_TIME_MICROS is not None:
        days = int(REPLAY_TIME_MICROS // 86_400_000_000)
    else:
        days = (datetime.date.today() - datetime.date(1970, 1, 1)).days

    def impl(env, cols, node):
        return Column(data=jnp.full((env.plen,), days, jnp.int32), ltype=DATE)
    return DATE, impl, []


@register("now")
@register("current_timestamp")
@register("get_current_timestamp")
@register("transaction_timestamp")
def _bind_now(arg_exprs):
    import datetime

    _mark_nondeterministic()
    micros = (REPLAY_TIME_MICROS if REPLAY_TIME_MICROS is not None
              else int((datetime.datetime.now()
                        - datetime.datetime(1970, 1, 1))
                       .total_seconds() * 1e6))

    def impl(env, cols, node):
        return Column(data=jnp.full((env.plen,), micros, jnp.int64),
                      ltype=TIMESTAMP)

    return TIMESTAMP, impl, []


@register("strftime")
def _bind_strftime(arg_exprs):
    """Host-side formatting (string output from an unbounded numeric domain
    cannot be a LUT). The executor falls back to eager evaluation when this
    appears in a traced pipeline (reference: strftime.cpp)."""
    import datetime

    fmt = str(arg_exprs[1].const_value())

    def impl(env, cols, node):
        import numpy as _np

        c = cols[0]
        d = _np.asarray(jnp.broadcast_to(c.data, (env.plen,)))
        epoch = datetime.datetime(1970, 1, 1)
        if c.ltype.id is TypeId.TIMESTAMP:
            strs = [(epoch + datetime.timedelta(microseconds=int(v)))
                    .strftime(fmt) for v in d]
        else:
            strs = [(datetime.date(1970, 1, 1)
                     + datetime.timedelta(days=int(v))).strftime(fmt)
                    for v in d]
        uniq, codes = _np.unique(_np.array(strs, dtype=str),
                                 return_inverse=True)
        return Column(data=jnp.asarray(codes.astype(_np.int32)),
                      ltype=VARCHAR, validity=c.validity,
                      dict_values=uniq.astype(object))

    return VARCHAR, impl, arg_exprs[:1]


@register("strptime")
def _bind_strptime(arg_exprs):
    """VARCHAR → TIMESTAMP. Trace-safe: parses once per distinct dictionary
    value, result is a LUT gather."""
    import datetime

    fmt = str(arg_exprs[1].const_value())

    def impl(env, cols, node):
        import numpy as _np

        c = cols[0]
        epoch = datetime.datetime(1970, 1, 1)
        lut = _np.array(
            [int((datetime.datetime.strptime(str(s_), fmt) - epoch)
                 .total_seconds() * 1e6) for s_ in c.dict_values]
            or [0], dtype=_np.int64)
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, len(lut) - 1)]
        return Column(data=d, ltype=TIMESTAMP, validity=c.validity)

    return TIMESTAMP, impl, arg_exprs[:1]


@register("epoch")
def _bind_epoch(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        if c.ltype.id is TypeId.DATE:
            d = c.data.astype(jnp.int64) * 86400
        else:
            d = c.data // jnp.int64(1_000_000)
        return Column(data=d, ltype=BIGINT, validity=c.validity)
    return BIGINT, impl, arg_exprs


# -- misc --------------------------------------------------------------------
@register("typeof")
def _bind_typeof(arg_exprs):
    tname = str(arg_exprs[0].ltype)

    def impl(env, cols, node):
        vals = np.array([tname], dtype=object)
        return Column(data=jnp.zeros((env.plen,), jnp.int32), ltype=VARCHAR,
                      dict_values=vals)
    return VARCHAR, impl, []


@register("hash")
def _bind_hash(arg_exprs):
    def impl(env, cols, node):
        from duckdb_tpu.ops.hash import hash64

        c = cols[0]
        h = hash64(jnp.broadcast_to(c.data, (env.plen,)).astype(jnp.int64))
        return Column(data=h.astype(jnp.int64), ltype=BIGINT,
                      validity=c.validity)
    return BIGINT, impl, arg_exprs


@register("isfinite")
def _bind_isfinite(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jnp.isfinite(_to_double(cols[0])), ltype=BOOLEAN,
                      validity=cols[0].validity)
    return BOOLEAN, impl, arg_exprs


@register("isnan")
def _bind_isnan(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jnp.isnan(_to_double(cols[0])), ltype=BOOLEAN,
                      validity=cols[0].validity)
    return BOOLEAN, impl, arg_exprs


@register("isinf")
def _bind_isinf(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jnp.isinf(_to_double(cols[0])), ltype=BOOLEAN,
                      validity=cols[0].validity)
    return BOOLEAN, impl, arg_exprs


# -- round 3: more math / string / date coverage -----------------------------
@register("trunc")
def _bind_trunc(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jnp.trunc(_to_double(cols[0])), ltype=DOUBLE,
                      validity=cols[0].validity)
    return DOUBLE, impl, arg_exprs


@register("gcd")
def _bind_gcd(arg_exprs):
    def impl(env, cols, node):
        a = jnp.abs(jnp.broadcast_to(cols[0].data, (env.plen,)).astype(jnp.int64))
        b = jnp.abs(jnp.broadcast_to(cols[1].data, (env.plen,)).astype(jnp.int64))

        def body(_, ab):
            x, y = ab
            nz = y != 0
            return (jnp.where(nz, y, x), jnp.where(nz, jnp.mod(x, y), 0))

        x, y = jax.lax.fori_loop(0, 63, body, (a, b))
        return Column(data=x, ltype=BIGINT,
                      validity=_and_validity(cols[0].validity,
                                             cols[1].validity))
    return BIGINT, impl, arg_exprs


@register("lcm")
def _bind_lcm(arg_exprs):
    def impl(env, cols, node):
        a = jnp.abs(jnp.broadcast_to(cols[0].data, (env.plen,)).astype(jnp.int64))
        b = jnp.abs(jnp.broadcast_to(cols[1].data, (env.plen,)).astype(jnp.int64))

        def body(_, ab):
            x, y = ab
            nz = y != 0
            return (jnp.where(nz, y, x), jnp.where(nz, jnp.mod(x, y), 0))

        g, _ = jax.lax.fori_loop(0, 63, body, (a, b))
        d = jnp.where(g > 0, a // jnp.maximum(g, 1) * b, 0)
        return Column(data=d, ltype=BIGINT,
                      validity=_and_validity(cols[0].validity,
                                             cols[1].validity))
    return BIGINT, impl, arg_exprs


@register("bit_count")
def _bind_bit_count(arg_exprs):
    def impl(env, cols, node):
        x = jnp.broadcast_to(cols[0].data, (env.plen,)).astype(jnp.uint64)
        cnt = jnp.zeros((env.plen,), jnp.int64)
        for shift in range(0, 64, 8):
            byte = (x >> jnp.uint64(shift)) & jnp.uint64(0xFF)
            lut = jnp.asarray([bin(i).count("1") for i in range(256)],
                              dtype=jnp.int64)
            cnt = cnt + lut[byte.astype(jnp.int32)]
        return Column(data=cnt, ltype=BIGINT, validity=cols[0].validity)
    return BIGINT, impl, arg_exprs


@register("mod")
def _bind_mod(arg_exprs):
    t = arg_exprs[0].ltype

    def impl(env, cols, node):
        x = jnp.broadcast_to(cols[0].data, (env.plen,)).astype(jnp.int64)
        y = jnp.broadcast_to(cols[1].data, (env.plen,)).astype(jnp.int64)
        # duckdb mod follows the dividend's sign (fmod), not floor
        d = x - jnp.trunc(x.astype(jnp.float64) / y.astype(jnp.float64)
                          ).astype(jnp.int64) * y
        return Column(data=d, ltype=BIGINT,
                      validity=_and_validity(cols[0].validity,
                                             cols[1].validity))
    return BIGINT, impl, arg_exprs


def _host_int_fn(name, fn):
    """String → int function over the dictionary."""
    def bind(arg_exprs):
        def impl(env, cols, node):
            c = cols[0]
            lut = np.fromiter((fn(s) for s in c.dict_values), dtype=np.int64,
                              count=len(c.dict_values))
            d = jnp.asarray(lut)[jnp.clip(c.data, 0, len(lut) - 1)]
            return Column(data=d, ltype=BIGINT, validity=c.validity)
        return BIGINT, impl, arg_exprs
    REGISTRY[name] = bind


_host_int_fn("unicode", lambda s: ord(s[0]) if s else -1)
_host_int_fn("ord", lambda s: ord(s[0]) if s else -1)


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                           prev[j] + (ca != cb)))
        prev = cur
    return prev[-1]


@register("levenshtein")
@register("editdist3")
def _bind_levenshtein(arg_exprs):
    other = arg_exprs[1].const_value()

    def impl(env, cols, node):
        c = cols[0]
        lut = np.fromiter((_lev(s, other) for s in c.dict_values),
                          dtype=np.int64, count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, len(lut) - 1)]
        return Column(data=d, ltype=BIGINT, validity=c.validity)
    return BIGINT, impl, arg_exprs[:1]


@register("hamming")
@register("mismatches")
def _bind_hamming(arg_exprs):
    other = arg_exprs[1].const_value()

    def impl(env, cols, node):
        c = cols[0]

        def f(s):
            if len(s) != len(other):
                return -1
            return sum(x != y for x, y in zip(s, other))
        lut = np.fromiter((f(s) for s in c.dict_values), dtype=np.int64,
                          count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, len(lut) - 1)]
        return Column(data=d, ltype=BIGINT, validity=c.validity)
    return BIGINT, impl, arg_exprs[:1]


_str_transform("translate",
               lambda frm, to: lambda s: s.translate(str.maketrans(frm, to)),
               2)
_str_transform("to_hex", lambda: lambda s: s)  # placeholder for VARCHAR arg


@register("hex")
def _bind_hex(arg_exprs):
    t = arg_exprs[0].ltype
    if t.id is TypeId.VARCHAR:
        def impl(env, cols, node):
            return dict_transform(cols[0], lambda s: s.encode().hex().upper())
        return VARCHAR, impl, arg_exprs

    def impl(env, cols, node):
        c = cols[0]
        # host LUT impossible for ints; compute per row on host is wrong —
        # format via device nibbles would need string building; use python
        # only for plausible small dictionaries: fall back to error
        raise BindError("hex over non-varchar not yet supported")
    return VARCHAR, impl, arg_exprs


@register("format_bytes")
def _bind_format_bytes(arg_exprs):
    def impl(env, cols, node):
        raise BindError("format_bytes requires row-wise string building")
    return VARCHAR, impl, arg_exprs


@register("week")
@register("weekofyear")
def _bind_week(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        days = c.data.astype(jnp.int64)
        # ISO week number
        dow = jnp.mod(days + 3, 7)  # Monday=0
        thursday = days - dow + 3
        y, m, d = civil_from_days(thursday)
        from duckdb_tpu.planner.functions_ext import _civil_to_days

        jan1 = _civil_to_days(y, jnp.ones_like(m), jnp.ones_like(d))
        week = (thursday - jan1) // 7 + 1
        return Column(data=week, ltype=BIGINT, validity=c.validity)
    return BIGINT, impl, arg_exprs


@register("isodow")
def _bind_isodow(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        d = jnp.mod(c.data.astype(jnp.int64) + 3, 7) + 1  # Monday=1
        return Column(data=d, ltype=BIGINT, validity=c.validity)
    return BIGINT, impl, arg_exprs


@register("age")
def _bind_age(arg_exprs):
    def impl(env, cols, node):
        import datetime

        a = cols[0].data.astype(jnp.int64)
        if len(cols) > 1:
            b = cols[1].data.astype(jnp.int64)
        else:
            today = (datetime.date.today() - datetime.date(1970, 1, 1)).days
            b = jnp.full((env.plen,), today, jnp.int64)
        v = cols[0].validity
        if len(cols) > 1:
            v = _and_validity(v, cols[1].validity)
        return Column(data=a - b, ltype=BIGINT, validity=v)
    return BIGINT, impl, arg_exprs


@register("time_bucket")
def _bind_time_bucket(arg_exprs):
    from duckdb_tpu.planner.binder import bind_interval

    months, days_i, micros = arg_exprs[0].const_value()

    def impl(env, cols, node):
        c = cols[0]
        d = c.data.astype(jnp.int64)
        if days_i:
            out = (d // days_i) * days_i
            return Column(data=out.astype(c.data.dtype), ltype=c.ltype,
                          validity=c.validity)
        raise BindError("time_bucket by months not yet supported")
    return arg_exprs[1].ltype, impl, arg_exprs[1:]


@register("random")
def _bind_random(arg_exprs):
    _mark_nondeterministic()

    def impl(env, cols, node):
        import random as _random

        rng = REPLAY_RNG if REPLAY_RNG is not None else _random
        key = jax.random.PRNGKey(rng.getrandbits(31))
        return Column(data=jax.random.uniform(key, (env.plen,),
                                              dtype=jnp.float64),
                      ltype=DOUBLE)
    return DOUBLE, impl, []


@register("uuid")
@register("gen_random_uuid")
def _bind_uuid(arg_exprs):
    _mark_nondeterministic()

    def impl(env, cols, node):
        import uuid as _uuid

        if REPLAY_RNG is not None:
            u = _uuid.UUID(int=REPLAY_RNG.getrandbits(128), version=4)
        else:
            u = _uuid.uuid4()
        vals = np.array([str(u)], dtype=object)
        return Column(data=jnp.zeros((env.plen,), jnp.int32), ltype=VARCHAR,
                      dict_values=vals)
    return VARCHAR, impl, []


@register("uuidv4")
def _bind_uuidv4(arg_exprs):
    return _bind_uuid(arg_exprs)


@register("uuidv7")
def _bind_uuidv7(arg_exprs):
    """Time-ordered UUID v7 (reference: src/common/types/uuid.cpp UUIDv7)."""
    _mark_nondeterministic()

    def impl(env, cols, node):
        import time as _time
        import uuid as _uuid

        rng = REPLAY_RNG
        if rng is not None:
            ms, rand = rng.getrandbits(48), rng.getrandbits(74)
        else:
            import random as _random
            ms, rand = int(_time.time() * 1000), _random.getrandbits(74)
        val = (ms << 80) | (0x7 << 76) | ((rand >> 62) << 64) \
            | (0b10 << 62) | (rand & ((1 << 62) - 1))
        vals = np.array([str(_uuid.UUID(int=val))], dtype=object)
        return Column(data=jnp.zeros((env.plen,), jnp.int32), ltype=VARCHAR,
                      dict_values=vals)
    return VARCHAR, impl, []


@register("uuid_extract_version")
def _bind_uuid_extract_version(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        lut = np.fromiter(
            ((int(s.replace("-", "")[12], 16) if len(s.replace("-", "")) == 32
              else 0) for s in c.dict_values),
            dtype=np.int64, count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, len(lut) - 1)]
        return Column(data=d, ltype=BIGINT, validity=c.validity)
    return BIGINT, impl, arg_exprs


@register("uuid_extract_timestamp")
def _bind_uuid_extract_timestamp(arg_exprs):
    """Millisecond timestamp from a UUIDv7's top 48 bits."""
    def impl(env, cols, node):
        c = cols[0]
        lut = np.fromiter(
            ((int(s.replace("-", "")[:12], 16) * 1000
              if len(s.replace("-", "")) == 32 else 0)
             for s in c.dict_values),
            dtype=np.int64, count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, len(lut) - 1)]
        return Column(data=d, ltype=TIMESTAMP, validity=c.validity)
    return TIMESTAMP, impl, arg_exprs


@register("nextafter")
def _bind_nextafter(arg_exprs):
    def impl(env, cols, node):
        d = jnp.nextafter(_to_double(cols[0]), _to_double(cols[1]))
        return Column(data=d, ltype=DOUBLE,
                      validity=_and_validity(cols[0].validity,
                                             cols[1].validity))
    return DOUBLE, impl, arg_exprs


@register("bar")
def _bind_bar(arg_exprs):
    """Unicode bar chart (reference: core_functions/scalar/bar.cpp). The
    fractional tail uses the 1/8-block glyphs."""
    lo = float(arg_exprs[1].const_value())
    hi = float(arg_exprs[2].const_value())
    width = (float(arg_exprs[3].const_value()) if len(arg_exprs) > 3
             else 80.0)

    def impl(env, cols, node):
        import numpy as _np

        c = cols[0]
        x = _np.asarray(jnp.broadcast_to(c.data, (env.plen,)),
                        dtype=_np.float64)
        if c.ltype.id is TypeId.DECIMAL:
            x = x / (10.0 ** c.ltype.scale)
        frac = _np.clip((x - lo) / max(hi - lo, 1e-300), 0.0, 1.0) * width
        blocks = "▏▎▍▌▋▊▉█"
        strs = []
        for f in frac:
            full = int(f)
            rem = int((f - full) * 8)
            strs.append("█" * full + (blocks[rem - 1] if rem else ""))
        uniq, codes = _np.unique(_np.array(strs, dtype=str),
                                 return_inverse=True)
        return Column(data=jnp.asarray(codes.astype(_np.int32)),
                      ltype=VARCHAR, validity=c.validity,
                      dict_values=uniq.astype(object))

    return VARCHAR, impl, arg_exprs[:1]


def _format_like(pyfmt):
    def binder(arg_exprs):
        fmt = str(arg_exprs[0].const_value())

        def impl(env, cols, node):
            import numpy as _np

            mats = []
            for c in cols:
                d = _np.asarray(jnp.broadcast_to(c.data, (env.plen,)))
                if c.ltype.id is TypeId.VARCHAR:
                    d = c.dict_values[_np.clip(d, 0,
                                               len(c.dict_values) - 1)]
                elif c.ltype.id is TypeId.DECIMAL:
                    d = d / (10.0 ** c.ltype.scale)
                mats.append(d)
            strs = [pyfmt(fmt, [m[i] for m in mats])
                    for i in range(env.plen)]
            uniq, codes = _np.unique(_np.array(strs, dtype=str),
                                     return_inverse=True)
            validity = None
            for c in cols:
                if c.validity is not None:
                    v = jnp.broadcast_to(c.validity, (env.plen,))
                    validity = v if validity is None else \
                        jnp.logical_and(validity, v)
            return Column(data=jnp.asarray(codes.astype(_np.int32)),
                          ltype=VARCHAR, validity=validity,
                          dict_values=uniq.astype(object))

        return VARCHAR, impl, arg_exprs[1:]

    return binder


REGISTRY["format"] = _format_like(lambda f, a: f.format(*a))
REGISTRY["printf"] = _format_like(lambda f, a: f % tuple(a))


# set by Connection at construction; sequences are engine-global like the
# reference's catalog sequence entries
ACTIVE_SEQUENCES = {}

# -- determinism pinning ------------------------------------------------------
# WAL replay (and the original execution of WAL-logged statements) pins
# now()/current_date to the logged statement time and seeds random()/uuid()
# from the logged seed, so crash recovery reproduces the exact values the
# original execution stored (the reference sidesteps this by logging typed
# ROW images, src/storage/wal_replay.cpp; we log the entropy instead).
REPLAY_TIME_MICROS = None
REPLAY_RNG = None
# set during binding whenever a non-deterministic function is bound; the
# planner marks such plans uncacheable (a cached plan would freeze the
# bind-time now()) and the connection WAL-logs the pinned entropy
NONDET_BOUND = False


def _mark_nondeterministic():
    global NONDET_BOUND
    NONDET_BOUND = True


@register("nextval")
def _bind_nextval(arg_exprs):
    name = str(arg_exprs[0].const_value()).lower()

    def impl(env, cols, node):
        import numpy as _np

        seq = ACTIVE_SEQUENCES.get(name)
        if seq is None:
            raise ValueError(f'sequence "{name}" does not exist')
        inc = seq["increment"]
        start = seq["value"]
        live = _np.asarray(env.live)  # host-only: eager fallback in traces
        offs = _np.cumsum(live) - live  # live-row prefix counts
        vals = start + inc * offs.astype(_np.int64)
        seq["value"] = int(start + inc * int(live.sum()))
        return Column(data=jnp.asarray(vals), ltype=BIGINT)

    return BIGINT, impl, []


@register("currval")
def _bind_currval(arg_exprs):
    name = str(arg_exprs[0].const_value()).lower()

    def impl(env, cols, node):
        seq = ACTIVE_SEQUENCES.get(name)
        if seq is None:
            raise ValueError(f'sequence "{name}" does not exist')
        return Column(data=jnp.full((env.plen,),
                                    seq["value"] - seq["increment"],
                                    jnp.int64), ltype=BIGINT)

    return BIGINT, impl, []


@register("concat")
def _bind_concat_nary(arg_exprs):
    """n-ary concat: NULL arguments become '' (reference semantics differ
    from || which propagates NULL — core_functions concat.cpp). Non-VARCHAR
    args cast to VARCHAR; the pairwise combine reuses the || kernel
    (cross-product dictionary remap / row-wise host fallback)."""
    from duckdb_tpu.planner.bound import BoundCast

    wrapped = [a if a.ltype.id is TypeId.VARCHAR
               else BoundCast(a, VARCHAR) for a in arg_exprs]

    def null_to_empty(c):
        if c.validity is None:
            return c
        dvals = (c.dict_values if c.dict_values is not None
                 else np.empty(0, object))
        ext = np.concatenate([dvals.astype(object),
                              np.array([""], dtype=object)])
        uniq, inv = np.unique(ext.astype(str), return_inverse=True)
        lut = jnp.asarray(inv[:-1].astype(np.int32)) if len(dvals) else None
        empty_code = int(inv[-1])
        codes = (lut[jnp.clip(c.data, 0, len(dvals) - 1)]
                 if lut is not None else jnp.zeros_like(c.data))
        data = jnp.where(c.validity, codes, empty_code)
        return Column(data=data, ltype=VARCHAR,
                      dict_values=uniq.astype(object))

    def impl(env, cols, node):
        from duckdb_tpu.planner.binder import concat_pair

        acc = null_to_empty(cols[0])
        for c in cols[1:]:
            acc = concat_pair(env, acc, null_to_empty(c))
        return acc

    return VARCHAR, impl, wrapped
