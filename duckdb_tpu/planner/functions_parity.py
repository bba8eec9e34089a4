"""Function-library parity: the reference registrations not covered by
functions.py / functions_ext.py / functions_more.py / functions_nested.py.

Covers (reference: /root/reference/src/function/function_list.cpp +
/root/reference/extension/core_functions/function_list.cpp):
- bitwise operators as named functions ("&", "|", "xor", "<<", ">>", "~")
  plus BIT accessors get_bit/set_bit/bit_position/bitstring
- list vector math (list_distance / dot products / cosine family) and the
  remaining list surface (zip/select/where/resize/grade_up/intersect/
  has_all/has_any), with the full array_* alias family
- struct surface (insert/update/concat/keys/values/contains/position/...)
- map surface (entries/from_entries/concat/extract)
- interval constructors (to_years/to_months/... , normalized_interval)
- generic/meta functions (stats, vector_type, glob, path_join,
  in_search_path, current_query_id, getvariable, create_sort_key, ...)

Everything follows the module conventions of functions_nested.py: nested
values are dict-encoded (int32 device codes + host tuples), so these run
per-distinct-value on the host and become one device LUT gather.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from duckdb_tpu.blocks import Column
from duckdb_tpu.planner.bound import _and_validity
from duckdb_tpu.planner.functions import REGISTRY, register, dict_transform
from duckdb_tpu.planner.functions_nested import (
    BindError,
    _const_py,
    _lut_gather,
    _pairwise_list_op,
    encode_objects,
    obj_array,
)
from duckdb_tpu.types import (
    BIGINT,
    BOOLEAN,
    DOUBLE,
    INTEGER,
    INTERVAL,
    SQLNULL,
    VARCHAR,
    LogicalType,
    TypeId,
    list_of,
    struct_of,
)


def _merge_valid(cols):
    v = None
    for c in cols:
        v = _and_validity(v, c.validity)
    return v


# -- bitwise operators --------------------------------------------------------
# reference: src/function/scalar/operator/bitwise.cpp (& | xor << >> ~)

def _int_out(lt_a, lt_b=None):
    ids = [lt_a.id] + ([lt_b.id] if lt_b is not None else [])
    for t in ids:
        if t not in (TypeId.TINYINT, TypeId.SMALLINT, TypeId.INTEGER,
                     TypeId.BIGINT, TypeId.HUGEINT, TypeId.SQLNULL,
                     TypeId.BOOLEAN):
            raise BindError("bitwise operators require integer operands")
    return BIGINT


def _mk_bitop(name, fn):
    @register(name)
    def _b(arg_exprs, fn=fn):
        out = _int_out(arg_exprs[0].ltype, arg_exprs[1].ltype)

        def impl(env, cols, node):
            a = jnp.broadcast_to(cols[0].data, (env.plen,)).astype(jnp.int64)
            b = jnp.broadcast_to(cols[1].data, (env.plen,)).astype(jnp.int64)
            return Column(data=fn(a, b), ltype=out,
                          validity=_merge_valid(cols))

        return out, impl, arg_exprs


_mk_bitop("&", jnp.bitwise_and)
_mk_bitop("|", jnp.bitwise_or)
_mk_bitop("xor", jnp.bitwise_xor)
_mk_bitop("<<", lambda a, b: jnp.where(
    (b >= 64) | (b < 0), jnp.int64(0), a << jnp.clip(b, 0, 63)))
_mk_bitop(">>", lambda a, b: jnp.where(
    (b >= 64) | (b < 0), jnp.int64(0),
    jax_lsr(a, jnp.clip(b, 0, 63))))


def jax_lsr(a, b):
    """Logical (unsigned) right shift on int64 (reference >> semantics)."""
    ua = a.view(jnp.uint64) if hasattr(a, "view") else a.astype(jnp.uint64)
    return (ua >> b.astype(jnp.uint64)).astype(jnp.int64)


@register("~")
def _bind_bitnot(arg_exprs):
    out = _int_out(arg_exprs[0].ltype)

    def impl(env, cols, node):
        a = jnp.broadcast_to(cols[0].data, (env.plen,)).astype(jnp.int64)
        return Column(data=jnp.bitwise_not(a), ltype=out,
                      validity=cols[0].validity)

    return out, impl, arg_exprs


@register("get_bit")
def _bind_get_bit(arg_exprs):
    # reference: src/function/scalar/bit/ — BIT-typed form via the dict
    # plane; integer form kept for BIGINT args
    if arg_exprs[0].ltype.id is TypeId.BIT:
        from duckdb_tpu.planner.functions_nested import bind_get_bit_typed

        return bind_get_bit_typed(arg_exprs)

    def impl(env, cols, node):
        a = jnp.broadcast_to(cols[0].data, (env.plen,)).astype(jnp.int64)
        i = jnp.broadcast_to(cols[1].data, (env.plen,)).astype(jnp.int64)
        return Column(data=(a >> jnp.clip(i, 0, 63)) & 1, ltype=INTEGER,
                      validity=_merge_valid(cols))

    return INTEGER, impl, arg_exprs


@register("set_bit")
def _bind_set_bit(arg_exprs):
    if arg_exprs[0].ltype.id is TypeId.BIT:
        from duckdb_tpu.planner.functions_nested import bind_set_bit_typed

        return bind_set_bit_typed(arg_exprs)

    def impl(env, cols, node):
        a = jnp.broadcast_to(cols[0].data, (env.plen,)).astype(jnp.int64)
        i = jnp.clip(jnp.broadcast_to(cols[1].data, (env.plen,)), 0,
                     63).astype(jnp.int64)
        v = jnp.broadcast_to(cols[2].data, (env.plen,)).astype(jnp.int64) & 1
        cleared = a & jnp.bitwise_not(jnp.int64(1) << i)
        return Column(data=cleared | (v << i), ltype=BIGINT,
                      validity=_merge_valid(cols))

    return BIGINT, impl, arg_exprs


@register("bit_position")
def _bind_bit_position(arg_exprs):
    if arg_exprs[-1].ltype.id is TypeId.BIT:
        from duckdb_tpu.planner.functions_nested import (
            bind_bit_position_typed)

        return bind_bit_position_typed(arg_exprs)
    # bit_position(substring_bits, bits): 1-based position of the first
    # set bit pattern; integer form: position of lowest set bit of arg2
    # matching arg1 — simplified to "position of first set bit" when
    # called with one arg
    def impl(env, cols, node):
        a = jnp.broadcast_to(cols[-1].data, (env.plen,)).astype(jnp.int64)
        # lowest set bit position, 1-based; 0 when none
        low = a & -a
        pos = jnp.where(a == 0, jnp.int64(0),
                        jnp.log2(jnp.maximum(low, 1).astype(jnp.float64))
                        .astype(jnp.int64) + 1)
        return Column(data=pos, ltype=INTEGER,
                      validity=_merge_valid(cols))

    return INTEGER, impl, arg_exprs


@register("bitstring")
def _bind_bitstring(arg_exprs):
    if arg_exprs[0].ltype.id is TypeId.BIT:
        from duckdb_tpu.planner.functions_nested import (
            bind_bitstring_typed)

        return bind_bitstring_typed(arg_exprs)
    # bitstring('0101', n) → zero-padded bit string of length n (VARCHAR
    # carrier when called on plain text)
    n = int(arg_exprs[1].const_value())

    def impl(env, cols, node):
        return dict_transform(
            cols[0], lambda s: s.rjust(n, "0") if len(s) < n else s)

    return VARCHAR, impl, arg_exprs[:1]


# -- math aliases -------------------------------------------------------------

REGISTRY["greatest_common_divisor"] = REGISTRY["gcd"]
REGISTRY["least_common_multiple"] = REGISTRY["lcm"]


@register("equi_width_bins")
def _bind_equi_width_bins(arg_exprs):
    """equi_width_bins(min, max, count, nice) → list of bin upper bounds
    (reference: core_functions/scalar/generic/binning.cpp)."""
    lo, _ = _const_py(arg_exprs[0])
    hi, _ = _const_py(arg_exprs[1])
    n, _ = _const_py(arg_exprs[2])
    nice = False
    if len(arg_exprs) > 3:
        nice, _ = _const_py(arg_exprs[3])
    lo_f, hi_f, n = float(lo), float(hi), int(n)
    if n <= 0:
        raise BindError("bin count must be positive")
    if hi_f < lo_f:
        raise BindError("upper bound must be greater than lower bound")
    is_int = arg_exprs[0].ltype.is_integer and arg_exprs[1].ltype.is_integer
    if nice:
        # snap the step to 1/2/5 × 10^k like the reference's "nice" mode
        span = (hi_f - lo_f) / n
        mag = 10 ** math.floor(math.log10(span)) if span > 0 else 1
        step = min((s for s in (1 * mag, 2 * mag, 2.5 * mag, 5 * mag,
                                10 * mag) if s >= span), default=mag)
        start = math.floor(lo_f / step) * step
        bins = []
        b = start + step
        while b < hi_f - 1e-12:
            bins.append(b)
            b += step
        bins.append(b)
    else:
        bins = [lo_f + (hi_f - lo_f) * (i + 1) / n for i in range(n)]
    if is_int and all(float(b).is_integer() for b in bins):
        entry = tuple(int(b) for b in bins)
        lt = list_of(BIGINT)
    else:
        entry = tuple(float(b) for b in bins)
        lt = list_of(DOUBLE)

    def impl(env, cols, node):
        return Column(data=jnp.zeros((env.plen,), jnp.int32), ltype=lt,
                      dict_values=obj_array([entry]))

    return lt, impl, []


def _fmt_readable(base):
    units = ["bytes", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB"] \
        if base == 1024 else ["bytes", "kB", "MB", "GB", "TB", "PB", "EB"]

    def fmt(v):
        v = int(v)
        neg = "-" if v < 0 else ""
        v = abs(v)
        if v < base:
            return f"{neg}{v} bytes"
        f = float(v)
        for u in units[1:]:
            f /= base
            if f < base:
                return f"{neg}{f:.1f} {u}"
        return f"{neg}{f:.1f} {units[-1]}"

    return fmt


def _mk_format_readable(name, base):
    @register(name)
    def _b(arg_exprs, base=base):
        fmt = _fmt_readable(base)

        def impl(env, cols, node):
            c = cols[0]
            vals = np.asarray(jnp.broadcast_to(c.data, (env.plen,)))
            # host finalize is fine: formatting is a result-surface fn
            strs = np.array([fmt(v) for v in vals], dtype=object)
            uniq, inv = np.unique(strs.astype(str), return_inverse=True)
            return Column(data=jnp.asarray(inv.astype(np.int32)),
                          ltype=VARCHAR, validity=c.validity,
                          dict_values=uniq.astype(object))

        return VARCHAR, impl, arg_exprs


_mk_format_readable("formatReadableSize", 1024)
_mk_format_readable("format_bytes", 1024)
_mk_format_readable("formatReadableDecimalSize", 1000)


# -- glob (scalar) ------------------------------------------------------------

@register("glob")
def _bind_glob(arg_exprs):
    """string ~~~ pattern (reference GlobPatternFun, Name "~~~"/"glob")."""
    import fnmatch

    pat_e = arg_exprs[1]
    try:
        pat = str(pat_e.const_value())
    except Exception as exc:  # noqa: BLE001
        raise BindError("glob requires a constant pattern") from exc
    from duckdb_tpu.planner.functions import dict_predicate

    def impl(env, cols, node):
        return dict_predicate(cols[0],
                              lambda s, pat=pat: fnmatch.fnmatchcase(s, pat))

    return BOOLEAN, impl, arg_exprs[:1]


# -- list vector math ---------------------------------------------------------
# reference: extension/core_functions/scalar/list/list_distance.cpp etc.

def _pairwise_scalar_op(a, b, fn, lt):
    """Per-distinct-PAIR host op → NUMERIC LUT gathered by pair code."""
    if a.dict_values is None or b.dict_values is None:  # typed-NULL input
        return Column(data=jnp.zeros(a.data.shape, lt.np_dtype), ltype=lt,
                      validity=jnp.zeros(a.data.shape, jnp.bool_))
    na = max(len(a.dict_values), 1)
    nb = max(len(b.dict_values), 1)
    vals = [fn(ta, tb) for ta in a.dict_values for tb in b.dict_values] \
        or [fn((), ())]
    lut_valid = np.array([v is not None for v in vals], bool)
    lut = np.array([0.0 if v is None else v for v in vals], lt.np_dtype)
    pair = (jnp.clip(a.data, 0, na - 1).astype(jnp.int32) * nb
            + jnp.clip(b.data, 0, nb - 1).astype(jnp.int32))
    pc = jnp.clip(pair, 0, max(len(vals) - 1, 0))
    validity = jnp.asarray(lut_valid)[pc]
    va = a.validity if a.validity is not None else None
    vb = b.validity if b.validity is not None else None
    v = _and_validity(_and_validity(validity, va), vb)
    return Column(data=jnp.asarray(lut)[pc], ltype=lt, validity=v)


def _vec_pair(name, fn):
    def binder(arg_exprs):
        def impl(env, cols, node):
            def op(ta, tb, fn=fn):
                if ta is None or tb is None:
                    return None
                if len(ta) != len(tb):
                    raise ValueError(
                        f"{name}: list dimensions must match "
                        f"({len(ta)} != {len(tb)})")
                a = np.asarray(ta, dtype=np.float64)
                b = np.asarray(tb, dtype=np.float64)
                return float(fn(a, b))

            return _pairwise_scalar_op(cols[0], cols[1], op, DOUBLE)

        return DOUBLE, impl, arg_exprs

    for n in (name, name.replace("list_", "array_")):
        REGISTRY[n] = binder


_vec_pair("list_distance", lambda a, b: np.sqrt(np.sum((a - b) ** 2)))
_vec_pair("list_dot_product", lambda a, b: np.dot(a, b))
_vec_pair("list_inner_product", lambda a, b: np.dot(a, b))
_vec_pair("list_negative_dot_product", lambda a, b: -np.dot(a, b))
_vec_pair("list_negative_inner_product", lambda a, b: -np.dot(a, b))
_vec_pair("list_cosine_similarity",
          lambda a, b: np.dot(a, b)
          / (np.linalg.norm(a) * np.linalg.norm(b)))
_vec_pair("list_cosine_distance",
          lambda a, b: 1.0 - np.dot(a, b)
          / (np.linalg.norm(a) * np.linalg.norm(b)))


@register("array_cross_product")
def _bind_cross_product(arg_exprs):
    def impl(env, cols, node):
        def op(ta, tb):
            if ta is None or tb is None:
                return None
            if len(ta) != 3 or len(tb) != 3:
                raise ValueError("array_cross_product requires 3-element "
                                 "arrays")
            a = np.asarray(ta, np.float64)
            b = np.asarray(tb, np.float64)
            return tuple(float(x) for x in np.cross(a, b))

        return _pairwise_list_op(cols[0], cols[1], op, list_of(DOUBLE))

    return list_of(DOUBLE), impl, arg_exprs


# -- list remainder -----------------------------------------------------------

def _bind_two_list_bool(name, fn):
    def binder(arg_exprs):
        def impl(env, cols, node):
            def op(ta, tb, fn=fn):
                if ta is None or tb is None:
                    return None
                return fn(set(x for x in ta if x is not None),
                          set(x for x in tb if x is not None))

            return _pairwise_scalar_op(cols[0], cols[1], op, BOOLEAN)

        return BOOLEAN, impl, arg_exprs

    for n in (name, name.replace("list_", "array_")):
        REGISTRY[n] = binder


_bind_two_list_bool("list_has_all", lambda a, b: b <= a)
_bind_two_list_bool("list_has_any", lambda a, b: bool(a & b))


@register("list_intersect")
@register("array_intersect")
def _bind_list_intersect(arg_exprs):
    lt = arg_exprs[0].ltype

    def impl(env, cols, node):
        def op(ta, tb):
            sb = set(x for x in (tb or ()) if x is not None)
            return tuple(dict.fromkeys(
                x for x in (ta or ()) if x is not None and x in sb))

        return _pairwise_list_op(cols[0], cols[1], op, lt)

    return lt, impl, arg_exprs


@register("list_select")
@register("array_select")
def _bind_list_select(arg_exprs):
    """list_select(l, idx_list): elements at the given 1-based indexes
    (reference: core_functions/scalar/list/list_select.cpp)."""
    lt = arg_exprs[0].ltype

    def impl(env, cols, node):
        def op(ta, tb):
            ta = ta or ()
            out = []
            for i in (tb or ()):
                if i is None or not (1 <= int(i) <= len(ta)):
                    out.append(None)
                else:
                    out.append(ta[int(i) - 1])
            return tuple(out)

        return _pairwise_list_op(cols[0], cols[1], op, lt)

    return lt, impl, arg_exprs


@register("list_where")
@register("array_where")
def _bind_list_where(arg_exprs):
    """list_where(l, mask_list): elements where the mask is true
    (reference: core_functions/scalar/list/list_select.cpp ListWhereFun)."""
    lt = arg_exprs[0].ltype

    def impl(env, cols, node):
        def op(ta, tb):
            ta, tb = ta or (), tb or ()
            return tuple(v for v, m in zip(ta, tb) if m)

        return _pairwise_list_op(cols[0], cols[1], op, lt)

    return lt, impl, arg_exprs


@register("list_zip")
@register("array_zip")
def _bind_list_zip(arg_exprs):
    """zip N lists into a list of structs; pads to the longest with NULLs
    (reference: core_functions/scalar/list/list_zip.cpp; truncate=false)."""
    n_args = len(arg_exprs)
    fields = tuple((f"list_{i+1}", a.ltype.child or SQLNULL)
                   for i, a in enumerate(arg_exprs))
    lt = list_of(struct_of(*fields))

    def impl(env, cols, node):
        if n_args == 1:
            def op1(t):
                return tuple((v,) for v in t)

            c = cols[0]
            return _lut_gather_obj(c, [op1(t) for t in c.dict_values], lt)
        # pairwise fold for two lists (N>2 rare; handled pairwise too)
        if n_args == 2:
            def op(ta, tb):
                ta, tb = ta or (), tb or ()
                k = max(len(ta), len(tb))
                return tuple(
                    (ta[i] if i < len(ta) else None,
                     tb[i] if i < len(tb) else None) for i in range(k))

            return _pairwise_list_op(cols[0], cols[1], op, lt)
        raise BindError("list_zip supports up to 2 lists")

    return lt, impl, arg_exprs


def _lut_gather_obj(col, entries, lt):
    inv, dvals = encode_objects(entries)
    codes = jnp.asarray(inv)[jnp.clip(col.data, 0,
                                      max(len(inv) - 1, 0))]
    return Column(data=codes, ltype=lt, validity=col.validity,
                  dict_values=dvals)


@register("list_resize")
@register("array_resize")
def _bind_list_resize(arg_exprs):
    lt = arg_exprs[0].ltype
    n, _ = _const_py(arg_exprs[1])
    fill = None
    if len(arg_exprs) > 2:
        fill, _ = _const_py(arg_exprs[2])
    n = int(n)

    def impl(env, cols, node):
        c = cols[0]
        entries = [tuple(t)[:n] + (fill,) * max(0, n - len(t))
                   for t in c.dict_values]
        return _lut_gather_obj(c, entries, lt)

    return lt, impl, arg_exprs[:1]


def _grade_up(t):
    """1-based indexes that would sort the list ascending (reference:
    core_functions/scalar/list/list_grade_up.cpp — NULLs last)."""
    keyed = [(v is None, v, i + 1) for i, v in enumerate(t)]
    keyed.sort(key=lambda kv: (kv[0], kv[1] if kv[1] is not None else 0))
    return tuple(i for _, _, i in keyed)


@register("grade_up")
@register("list_grade_up")
@register("array_grade_up")
def _bind_grade_up(arg_exprs):
    lt = list_of(BIGINT)

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather_obj(c, [_grade_up(t) for t in c.dict_values], lt)

    return lt, impl, arg_exprs


@register("unpivot_list")
def _bind_unpivot_list(arg_exprs):
    # list_value alias used by UNPIVOT plans
    return REGISTRY["list_value"](arg_exprs)


# -- struct surface -----------------------------------------------------------
# reference: src/function/scalar/struct/*.cpp

def _struct_fields(e):
    if e.ltype.id is not TypeId.STRUCT:
        raise BindError("function expects a STRUCT argument")
    return list(e.ltype.fields or ())


@register("struct_keys")
def _bind_struct_keys(arg_exprs):
    fields = _struct_fields(arg_exprs[0])
    lt = list_of(VARCHAR)
    entry = tuple(n for n, _ in fields)

    def impl(env, cols, node):
        return Column(data=jnp.zeros((env.plen,), jnp.int32), ltype=lt,
                      validity=cols[0].validity,
                      dict_values=obj_array([entry]))

    return lt, impl, arg_exprs


@register("struct_values")
def _bind_struct_values(arg_exprs):
    fields = _struct_fields(arg_exprs[0])
    child = fields[0][1] if fields else SQLNULL
    lt = list_of(child)

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather_obj(c, [tuple(t) for t in c.dict_values], lt)

    return lt, impl, arg_exprs


@register("struct_contains")
def _bind_struct_contains(arg_exprs):
    val, _ = _const_py(arg_exprs[1])

    def impl(env, cols, node):
        c = cols[0]
        lut = np.fromiter((val in t for t in c.dict_values), np.bool_,
                          count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, max(len(lut) - 1, 0))]
        return Column(data=d, ltype=BOOLEAN, validity=c.validity)

    return BOOLEAN, impl, arg_exprs[:1]


@register("struct_position")
@register("struct_indexof")
def _bind_struct_position(arg_exprs):
    val, _ = _const_py(arg_exprs[1])

    def impl(env, cols, node):
        c = cols[0]

        def pos(t):
            for i, v in enumerate(t):
                if v == val:
                    return i + 1
            return None

        return _lut_gather(c, [pos(t) for t in c.dict_values], BIGINT)

    return BIGINT, impl, arg_exprs[:1]


@register("struct_has")
def _bind_struct_has(arg_exprs):
    fields = _struct_fields(arg_exprs[0])
    name = str(arg_exprs[1].const_value()).lower()
    present = any(n.lower() == name for n, _ in fields)

    def impl(env, cols, node):
        return Column(data=jnp.full((env.plen,), present, jnp.bool_),
                      ltype=BOOLEAN, validity=cols[0].validity)

    return BOOLEAN, impl, arg_exprs[:1]


@register("struct_extract_at")
def _bind_struct_extract_at(arg_exprs):
    fields = _struct_fields(arg_exprs[0])
    idx = int(arg_exprs[1].const_value())
    if not (1 <= idx <= len(fields)):
        raise BindError(f"struct_extract_at index {idx} out of range")
    ftype = fields[idx - 1][1]

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather(c, [t[idx - 1] if idx - 1 < len(t) else None
                               for t in c.dict_values], ftype)

    return ftype, impl, arg_exprs[:1]


def bind_struct_insert_update(name, base_b, named_pairs):
    """struct_insert/struct_update with (name, bound-const-expr) pairs —
    invoked from binder._bind_FunctionCall, which strips the `k := v` /
    `k := v` named-argument AST shape (reference:
    src/function/scalar/struct/struct_insert.cpp)."""
    fields = _struct_fields(base_b)
    consts = [(nm, *_const_py(b)) for nm, b in named_pairs]
    if name == "struct_insert":
        for nm, _, _ in consts:
            if any(n.lower() == nm.lower() for n, _ in fields):
                raise BindError(f'duplicate struct field name "{nm}"')
        lt = struct_of(*(fields + [(nm, t) for nm, _, t in consts]))
        extra = tuple(v for _, v, _ in consts)

        def impl(env, cols, node):
            c = cols[0]
            return _lut_gather_obj(c, [tuple(t) + extra
                                       for t in c.dict_values], lt)

        return lt, impl
    updates = {nm.lower(): (v, t) for nm, v, t in consts}
    unknown = set(updates) - {n.lower() for n, _ in fields}
    if unknown:
        raise BindError(f"struct_update: unknown fields {sorted(unknown)}")
    new_fields, idx_updates = [], {}
    for i, (n, t) in enumerate(fields):
        if n.lower() in updates:
            v, nt = updates[n.lower()]
            new_fields.append((n, nt))
            idx_updates[i] = v
        else:
            new_fields.append((n, t))
    lt = struct_of(*new_fields)

    def impl(env, cols, node):
        c = cols[0]

        def upd(t):
            return tuple(idx_updates.get(i, v) for i, v in enumerate(t))

        return _lut_gather_obj(c, [upd(t) for t in c.dict_values], lt)

    return lt, impl


@register("struct_concat")
def _bind_struct_concat(arg_exprs):
    all_fields = []
    for a in arg_exprs:
        all_fields.extend(_struct_fields(a))
    seen = set()
    for n, _ in all_fields:
        if n.lower() in seen:
            raise BindError(f'duplicate struct field name "{n}"')
        seen.add(n.lower())
    lt = struct_of(*all_fields)

    def impl(env, cols, node):
        if len(cols) == 1:
            return cols[0]
        out = _pairwise_list_op(
            cols[0], cols[1],
            lambda ta, tb: tuple(ta or ()) + tuple(tb or ()), lt)
        for c in cols[2:]:
            out = _pairwise_list_op(
                out, c, lambda ta, tb: tuple(ta or ()) + tuple(tb or ()),
                lt)
        return out

    return lt, impl, arg_exprs


# -- map surface --------------------------------------------------------------
# reference: extension/core_functions/scalar/map/*.cpp

def _map_types(e):
    if e.ltype.id is not TypeId.MAP:
        raise BindError("function expects a MAP argument")
    f = e.ltype.fields or (("key", SQLNULL), ("value", SQLNULL))
    return f[0][1], f[1][1]


@register("map_entries")
def _bind_map_entries(arg_exprs):
    kt, vt = _map_types(arg_exprs[0])
    lt = list_of(struct_of(("key", kt), ("value", vt)))

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather_obj(c, [tuple(t) for t in c.dict_values], lt)

    return lt, impl, arg_exprs


@register("map_from_entries")
def _bind_map_from_entries(arg_exprs):
    base = arg_exprs[0]
    if base.ltype.id is not TypeId.LIST:
        raise BindError("map_from_entries expects a LIST of structs")
    st = base.ltype.child
    kt = vt = SQLNULL
    if st is not None and st.fields:
        kt, vt = st.fields[0][1], st.fields[1][1]
    from duckdb_tpu.types import map_of

    lt = map_of(kt, vt)

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather_obj(c, [tuple(tuple(p) for p in t)
                                   for t in c.dict_values], lt)

    return lt, impl, arg_exprs


@register("map_concat")
def _bind_map_concat(arg_exprs):
    lt = arg_exprs[0].ltype

    def impl(env, cols, node):
        def op(ta, tb):
            merged = dict(tuple(p) for p in (ta or ()))
            merged.update(dict(tuple(p) for p in (tb or ())))
            return tuple(merged.items())

        out = cols[0]
        for c in cols[1:]:
            out = _pairwise_list_op(out, c, op, lt)
        return out

    return lt, impl, arg_exprs


@register("map_extract_value")
def _bind_map_extract_value(arg_exprs):
    from duckdb_tpu.planner.functions_nested import map_element

    return map_element(arg_exprs)


@register("map_extract")
def _bind_map_extract(arg_exprs):
    """map_extract → single-element list of the value ([] when absent) —
    the reference's historical list-returning form."""
    kt, vt = _map_types(arg_exprs[0])
    key, _ = _const_py(arg_exprs[1])
    lt = list_of(vt)

    def impl(env, cols, node):
        c = cols[0]

        def pick(t):
            for k, v in (tuple(p) for p in t):
                if k == key:
                    return (v,)
            return ()

        return _lut_gather_obj(c, [pick(t) for t in c.dict_values], lt)

    return lt, impl, arg_exprs[:1]


# -- interval constructors ----------------------------------------------------
# reference: core_functions/scalar/date/to_interval.cpp. Month-granularity
# interval VALUES are bind-time (months, days, micros) tuples in this
# engine (binder._bind_interval_arith), so these bind in
# binder._bind_FunctionCall via MONTH_INTERVAL_FNS → BoundLiteral.

MONTH_INTERVAL_FNS = {"to_months": 1, "to_quarters": 3, "to_years": 12,
                      "to_decades": 120, "to_centuries": 1200,
                      "to_millennia": 12000}


@register("nanosecond")
def _bind_nanosecond(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        x = jnp.broadcast_to(c.data, (env.plen,)).astype(jnp.int64)
        # nanoseconds within the second (micros resolution × 1000)
        return Column(data=(x % 60_000_000) * 1000, ltype=BIGINT,
                      validity=c.validity)

    return BIGINT, impl, arg_exprs


@register("normalized_interval")
def _bind_normalized_interval(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        return c  # runtime intervals are already pure micros here

    return INTERVAL, impl, arg_exprs


# -- generic / meta -----------------------------------------------------------

@register("stats")
def _bind_stats(arg_exprs):
    """stats(expr) — human-readable statistics string (reference:
    core_functions/scalar/generic/stats.cpp)."""
    e = arg_exprs[0]

    def impl(env, cols, node):
        c = cols[0]
        try:
            lo = np.asarray(jnp.min(c.data)).item()
            hi = np.asarray(jnp.max(c.data)).item()
            s = f"[Min: {lo}, Max: {hi}]"
        except Exception:  # noqa: BLE001
            s = "[Min: ?, Max: ?]"
        uniq = np.array([s], dtype=object)
        return Column(data=jnp.zeros((env.plen,), jnp.int32),
                      ltype=VARCHAR, validity=c.validity, dict_values=uniq)

    return VARCHAR, impl, arg_exprs


@register("vector_type")
def _bind_vector_type(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        kind = ("DICTIONARY_VECTOR" if c.dict_values is not None
                else "FLAT_VECTOR")
        return Column(data=jnp.zeros((env.plen,), jnp.int32), ltype=VARCHAR,
                      dict_values=np.array([kind], dtype=object))

    return VARCHAR, impl, arg_exprs


@register("current_query_id")
def _bind_current_query_id(arg_exprs):
    def impl(env, cols, node):
        return Column(data=jnp.zeros((env.plen,), jnp.int64), ltype=BIGINT)

    return BIGINT, impl, arg_exprs


@register("in_search_path")
def _bind_in_search_path(arg_exprs):
    """in_search_path(db, schema) — is the schema in the search path?"""
    def impl(env, cols, node):
        sname = cols[-1]

        def chk(s):
            return s in ("main", "temp", "pg_catalog")

        from duckdb_tpu.planner.functions import dict_predicate

        return dict_predicate(sname, chk)

    return BOOLEAN, impl, arg_exprs


@register("path_join")
def _bind_path_join(arg_exprs):
    """Join path segments with the platform separator (reference:
    PathJoinFun, src/function/scalar/string_functions.hpp:388)."""
    import os

    consts = []
    for a in arg_exprs[1:]:
        v, _ = _const_py(a)
        consts.append("" if v is None else str(v))

    def impl(env, cols, node):
        return dict_transform(cols[0],
                              lambda s: os.path.join(s, *consts))

    return VARCHAR, impl, arg_exprs[:1]


@register("getvariable")
def _bind_getvariable(arg_exprs):
    """SQL variables (SET VARIABLE name = value); NULL when unset."""
    name = str(arg_exprs[0].const_value()).lower()
    from duckdb_tpu.planner import functions_ext as _fx

    variables = getattr(_fx, "SQL_VARIABLES", {})
    val = variables.get(name)

    def impl(env, cols, node):
        if val is None:
            return Column(data=jnp.zeros((env.plen,), jnp.int32),
                          ltype=VARCHAR,
                          validity=jnp.zeros((env.plen,), jnp.bool_),
                          dict_values=np.array([""], dtype=object))
        return Column(data=jnp.zeros((env.plen,), jnp.int32), ltype=VARCHAR,
                      dict_values=np.array([str(val)], dtype=object))

    return VARCHAR, impl, []


@register("create_sort_key")
def _bind_create_sort_key(arg_exprs):
    """Binary-comparable sort key (reference:
    src/function/scalar/create_sort_key.cpp). Host-side encoding into a
    hex-rendered VARCHAR carrier (no BLOB plane yet); byte order matches
    ASC NULLS LAST for each modifier pair."""
    exprs = arg_exprs[0::2]
    mods = []
    for m in arg_exprs[1::2]:
        mods.append(str(m.const_value()).lower())

    def impl(env, cols, node):
        vals_cols = cols[: len(exprs)]
        n = env.plen
        parts = []
        for c, mod in zip(vals_cols, mods or ["asc nulls last"] * len(
                vals_cols)):
            desc = "desc" in mod
            data = np.asarray(jnp.broadcast_to(c.data, (n,)))
            valid = (np.asarray(jnp.broadcast_to(c.validity, (n,)))
                     if c.validity is not None else np.ones(n, bool))
            if c.dict_values is not None:
                svals = np.asarray(
                    [str(c.dict_values[v]) for v in
                     np.clip(data, 0, len(c.dict_values) - 1)], dtype=object)
                enc = [s.encode() + b"\x00" for s in svals]
            elif np.issubdtype(data.dtype, np.integer) \
                    or data.dtype == np.bool_:
                # flip the sign bit so byte order == numeric order
                enc = [(int(v) ^ (1 << 63)).to_bytes(8, "big")
                       for v in data]
            else:
                enc = [np.float64(v).tobytes() for v in data]
            if desc:
                enc = [bytes(255 - b for b in e) for e in enc]
            pre = [(b"\x01" if ok else b"\x00") for ok in valid]
            parts.append([p + e for p, e in zip(pre, enc)])
        rows = [b"".join(p[i] for p in parts) for i in range(n)]
        strs = np.array([r.hex() for r in rows], dtype=object)
        uniq, inv = np.unique(strs.astype(str), return_inverse=True)
        return Column(data=jnp.asarray(inv.astype(np.int32)), ltype=VARCHAR,
                      dict_values=uniq.astype(object))

    return VARCHAR, impl, list(exprs)


@register("setval")
def _bind_setval(arg_exprs):
    """setval('seq', value) — set a sequence's current value (reference:
    src/function/scalar/sequence/nextval.cpp family)."""
    name = str(arg_exprs[0].const_value()).lower()
    val = int(arg_exprs[1].const_value())

    def impl(env, cols, node):
        from duckdb_tpu.planner.functions_ext import ACTIVE_SEQUENCES

        seq = ACTIVE_SEQUENCES.get(name)
        if seq is None:
            raise ValueError(f'sequence "{name}" does not exist')
        seq["value"] = val + seq["increment"]  # next nextval returns val+inc
        seq["last"] = val
        return Column(data=jnp.full((env.plen,), val, jnp.int64),
                      ltype=BIGINT)

    return BIGINT, impl, []


@register("is_histogram_other_bin")
def _bind_is_histogram_other_bin(arg_exprs):
    """True for the catch-all histogram bin sentinel: +inf for numerics,
    '' for strings (reference: core_functions/scalar/generic/binning.cpp
    IsHistogramOtherBinFun)."""
    t = arg_exprs[0].ltype

    def impl(env, cols, node):
        c = cols[0]
        if t.id is TypeId.VARCHAR:
            from duckdb_tpu.planner.functions import dict_predicate

            return dict_predicate(c, lambda s: s == "")
        if t.is_float:
            d = jnp.isposinf(jnp.broadcast_to(c.data, (env.plen,)))
        else:
            d = jnp.zeros((env.plen,), jnp.bool_)
        return Column(data=d, ltype=BOOLEAN, validity=c.validity)

    return BOOLEAN, impl, arg_exprs


@register("can_cast_implicitly")
def _bind_can_cast_implicitly(arg_exprs):
    from duckdb_tpu.types import implicit_cast_cost

    ok = implicit_cast_cost(arg_exprs[0].ltype, arg_exprs[1].ltype) \
        is not None

    def impl(env, cols, node):
        return Column(data=jnp.full((env.plen,), ok, jnp.bool_),
                      ltype=BOOLEAN)

    return BOOLEAN, impl, []


# -- array_* alias family -----------------------------------------------------
# the reference registers array_* aliases for most list functions
# (extension/core_functions/function_list.cpp alias entries)

_ARRAY_ALIASES = {
    "array_aggr": "list_aggr",
    "array_aggregate": "list_aggregate",
    "array_cat": "list_concat",
    "array_distinct": "list_distinct",
    "array_has": "list_contains",
    "array_indexof": "list_indexof",
    "array_reverse_sort": "list_reverse_sort",
    "array_sort": "list_sort",
    "array_unique": "list_unique",
    "array_value": "list_value",
    "array_slice": "list_slice",
    "array_position": "list_position",
    "array_reverse": "list_reverse",
    "array_append": "list_append",
    "array_prepend": "list_prepend",
    "array_has_all": "list_has_all",
    "array_has_any": "list_has_any",
}

for _alias, _target in _ARRAY_ALIASES.items():
    if _alias not in REGISTRY and _target in REGISTRY:
        REGISTRY[_alias] = REGISTRY[_target]
