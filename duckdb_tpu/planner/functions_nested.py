"""Nested types: LIST and STRUCT scalar functions.

TPU-first representation: nested values are dictionary-encoded exactly like
VARCHAR — the device plane is an int32 code per row and the distinct Python
tuples (lists) / records (structs) live host-side in the column's
`dict_values`. Scalar functions over nested values then run per-distinct-
value on the host and become device LUT gathers, so they stay trace-safe
and cost one gather regardless of row count.

Behavior parity reference: duckdb nested function family
(/root/reference/src/core_functions/scalar/list/*.cpp,
src/function/scalar/struct/*.cpp). Round-1 scope: literals and constant
arguments construct lists/structs; columnar construction (list_value over
column refs) lands with round 2.
"""

from __future__ import annotations

import datetime
import decimal as pydec

import jax.numpy as jnp
import numpy as np

from duckdb_tpu.blocks import Column
from duckdb_tpu.planner.functions import REGISTRY, register
from duckdb_tpu.types import (
    BIGINT, BOOLEAN, DOUBLE, INTEGER, SQLNULL, VARCHAR, LogicalType, TypeId,
    list_of, map_of, struct_of,
)


class BindError(ValueError):
    pass


def obj_array(entries) -> np.ndarray:
    """Object ndarray of tuples (np.array() would splat tuples into 2D)."""
    d = np.empty(len(entries), dtype=object)
    for i, e in enumerate(entries):
        d[i] = e
    return d


def encode_objects(entries):
    """Dedup hashable entries → (codes int32 ndarray, dict object array)."""
    seen = {}
    codes = np.empty(len(entries), dtype=np.int32)
    for i, e in enumerate(entries):
        if e not in seen:
            seen[e] = len(seen)
        codes[i] = seen[e]
    return codes, obj_array(list(seen))


def _const_py(e):
    """Python-level (logical) value of a constant bound expr."""
    try:
        v = e.const_value()
    except Exception as exc:  # noqa: BLE001
        if e.ltype.id in (TypeId.LIST, TypeId.STRUCT):
            # constant nested subexpression (e.g. an inner list literal):
            # evaluate on a 1-row empty env and read its single dict entry
            from duckdb_tpu.planner.bound import EvalEnv

            c = e.eval(EvalEnv(cols={}, plen=1,
                               live=jnp.ones((1,), jnp.bool_)))
            return tuple(c.dict_values[int(np.asarray(c.data)[0])]), e.ltype
        raise BindError(
            "nested constructors currently require constant arguments "
            "(columnar list_value lands in round 2)") from exc
    t = e.ltype
    if v is None:
        return None, SQLNULL
    if t.id is TypeId.DECIMAL:
        return pydec.Decimal(int(v)).scaleb(-t.scale), t
    if t.id is TypeId.DATE:
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=int(v)), t
    if t.id is TypeId.VARCHAR:
        return str(v), t
    if t.id is TypeId.BOOLEAN:
        return bool(v), t
    if t.is_float:
        return float(v), t
    return v, t


def _const_column(entry, lt: LogicalType):
    """A broadcastable single-entry dict-encoded constant column."""

    def impl(env, cols, node):
        return Column(data=jnp.zeros((env.plen,), dtype=jnp.int32), ltype=lt,
                      dict_values=obj_array([entry]))

    return impl


@register("list_value")
@register("list_pack")
def _bind_list_value(arg_exprs):
    vals = []
    child = SQLNULL
    for a in arg_exprs:
        v, t = _const_py(a)
        vals.append(v)
        if child.id is TypeId.SQLNULL:
            child = t
    lt = list_of(child)
    return lt, _const_column(tuple(vals), lt), []


@register("struct_pack_kv")
def _bind_struct_pack_kv(arg_exprs):
    """Interleaved ('name', expr, 'name', expr, ...) from the {..} literal."""
    fields = []
    vals = []
    for i in range(0, len(arg_exprs), 2):
        name = str(arg_exprs[i].const_value())
        v, t = _const_py(arg_exprs[i + 1])
        fields.append((name, t))
        vals.append(v)
    lt = struct_of(*fields)
    return lt, _const_column(tuple(vals), lt), []


def _column_from_pyvals(vals, ct: LogicalType):
    """Per-dict-entry Python values → (lut data, lut validity, dict|None)."""
    n = len(vals)
    valid = np.array([v is not None for v in vals], dtype=bool)
    if ct.id in (TypeId.VARCHAR, TypeId.BIT):
        strs = np.array([("" if v is None else str(v)) for v in vals],
                        dtype=object)
        uniq, inv = (np.unique(strs.astype(str), return_inverse=True)
                     if n else (np.empty(0, object), np.empty(0, np.int64)))
        return inv.astype(np.int32), valid, uniq.astype(object)
    if ct.id in (TypeId.LIST, TypeId.STRUCT, TypeId.ARRAY, TypeId.UNION):
        codes, dvals = encode_objects(
            [(() if v is None else tuple(v)) for v in vals])
        return codes, valid, dvals
    if ct.id is TypeId.DECIMAL:
        data = np.array([0 if v is None else int(pydec.Decimal(v).scaleb(
            ct.scale)) for v in vals], dtype=np.int64)
        return data, valid, None
    if ct.id is TypeId.DATE:
        epoch = datetime.date(1970, 1, 1)
        data = np.array([0 if v is None else (v - epoch).days for v in vals],
                        dtype=np.int32)
        return data, valid, None
    data = np.array([0 if v is None else v for v in vals],
                    dtype=ct.np_dtype if ct.id is not TypeId.SQLNULL
                    else np.int32)
    return data, valid, None


def _lut_gather(col: Column, vals, ct: LogicalType) -> Column:
    """Per-distinct host values → device column via one LUT gather."""
    data, valid, dvals = _column_from_pyvals(vals, ct)
    nd = max(len(col.dict_values), 1)
    codes = jnp.clip(col.data, 0, nd - 1)
    d = jnp.asarray(data)[codes]
    v = jnp.asarray(valid)[codes]
    if col.validity is not None:
        v = jnp.logical_and(v, col.validity)
    return Column(data=d, ltype=ct, validity=v, dict_values=dvals)


@register("list_extract")
@register("list_element")
@register("array_extract")
def _bind_list_extract(arg_exprs):
    base = arg_exprs[0]
    if base.ltype.id is TypeId.MAP:
        return map_element(arg_exprs)
    if base.ltype.id is TypeId.STRUCT:
        return _bind_struct_extract(arg_exprs)
    if base.ltype.id not in (TypeId.LIST, TypeId.ARRAY):
        raise BindError(
            f"list_extract expects a LIST argument, got {base.ltype!r}")
    idx = int(arg_exprs[1].const_value())
    ct = base.ltype.child or SQLNULL

    def impl(env, cols, node):
        c = cols[0]

        def pick(t):
            # 1-based; negative counts from the end; out of range → NULL
            i = idx - 1 if idx > 0 else idx
            if idx == 0 or i >= len(t) or i < -len(t):
                return None
            return t[i]

        return _lut_gather(c, [pick(t) for t in c.dict_values], ct)

    return ct, impl, arg_exprs[:1]


@register("struct_extract")
def _bind_struct_extract(arg_exprs):
    base = arg_exprs[0]
    if base.ltype.id is TypeId.MAP:
        return map_element(arg_exprs)
    if base.ltype.id is TypeId.UNION:
        return _bind_union_extract(arg_exprs)
    if base.ltype.id is not TypeId.STRUCT:
        raise BindError(
            f"struct_extract expects a STRUCT argument, got {base.ltype!r}")
    name = str(arg_exprs[1].const_value()).lower()
    fields = base.ltype.fields or ()
    for pos, (fname, ftype) in enumerate(fields):
        if fname.lower() == name:
            break
    else:
        raise BindError(f'struct has no field "{name}"')

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather(c, [t[pos] if pos < len(t) else None
                               for t in c.dict_values], ftype)

    return ftype, impl, arg_exprs[:1]


@register("list_contains")
@register("array_contains")
@register("list_has")
def _bind_list_contains(arg_exprs):
    needle, _ = _const_py(arg_exprs[1])

    def impl(env, cols, node):
        c = cols[0]
        lut = np.fromiter((needle in t for t in c.dict_values),
                          dtype=np.bool_, count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, max(len(lut) - 1, 0))]
        return Column(data=d, ltype=BOOLEAN, validity=c.validity)

    return BOOLEAN, impl, arg_exprs[:1]


@register("string_split")
@register("str_split")
@register("string_to_array")
@register("split")
def _bind_string_split(arg_exprs):
    sep = str(arg_exprs[1].const_value())
    lt = list_of(VARCHAR)

    def impl(env, cols, node):
        c = cols[0]
        entries = [tuple(str(s).split(sep)) for s in c.dict_values]
        inv, dvals = encode_objects(entries)
        codes = jnp.asarray(inv)[jnp.clip(c.data, 0,
                                          max(len(inv) - 1, 0))]
        return Column(data=codes, ltype=lt, validity=c.validity,
                      dict_values=dvals)

    return lt, impl, arg_exprs[:1]


def _list_transform(name, fn, out_child=None):
    """Register a LIST→LIST per-distinct transform."""

    def binder(arg_exprs):
        base = arg_exprs[0]
        if base.ltype.id is not TypeId.LIST:
            raise BindError(f"{name} expects a LIST argument")
        lt = (list_of(out_child) if out_child is not None else base.ltype)

        def impl(env, cols, node):
            c = cols[0]
            inv, dvals = encode_objects([fn(t) for t in c.dict_values])
            codes = jnp.asarray(inv)[jnp.clip(c.data, 0,
                                              max(len(inv) - 1, 0))]
            return Column(data=codes, ltype=lt, validity=c.validity,
                          dict_values=dvals)

        return lt, impl, arg_exprs[:1]

    REGISTRY[name] = binder


_list_transform("list_sort",
                lambda t: tuple(sorted((x for x in t if x is not None)))
                + tuple(None for x in t if x is None))
_list_transform("list_reverse_sort",
                lambda t: tuple(sorted((x for x in t if x is not None),
                                       reverse=True))
                + tuple(None for x in t if x is None))
_list_transform("list_distinct",
                lambda t: tuple(dict.fromkeys(x for x in t if x is not None)))
_list_transform("list_reverse", lambda t: tuple(reversed(t)))
_list_transform("array_pop_back", lambda t: tuple(t[:-1]))
_list_transform("array_pop_front", lambda t: tuple(t[1:]))
_list_transform("list_unique", lambda t: t)  # replaced below (scalar result)
del REGISTRY["list_unique"]


@register("list_unique")
def _bind_list_unique(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        lut = np.fromiter(
            (len(set(x for x in t if x is not None))
             for t in c.dict_values), dtype=np.int64,
            count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, max(len(lut) - 1, 0))]
        return Column(data=d, ltype=BIGINT, validity=c.validity)

    return BIGINT, impl, arg_exprs[:1]


@register("array_length")
@register("list_length")
def _bind_list_length(arg_exprs):
    def impl(env, cols, node):
        c = cols[0]
        lut = np.fromiter((len(t) for t in c.dict_values), dtype=np.int64,
                          count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, max(len(lut) - 1, 0))]
        return Column(data=d, ltype=BIGINT, validity=c.validity)

    return BIGINT, impl, arg_exprs


def _py_decode(lt, data, valid, dvals, i):
    if valid is not None and not valid[i]:
        return None
    v = data[i]
    if lt.id is TypeId.VARCHAR:
        return str(dvals[v])
    if lt.id in (TypeId.LIST, TypeId.STRUCT):
        return tuple(dvals[v])
    if lt.id is TypeId.DECIMAL:
        return pydec.Decimal(int(v)).scaleb(-lt.scale)
    if lt.id is TypeId.DATE:
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=int(v))
    if lt.is_float:
        return float(v)
    if lt.id is TypeId.BOOLEAN:
        return bool(v)
    return int(v)


def bind_lambda_func(name, base, body_b, pkey, child_t, ikey=None):
    """list_transform / list_filter with `x -> expr` lambdas.

    The lambda body is a bound expression over a synthetic element column.
    Because lists are dict-encoded, the body evaluates ONCE per distinct
    element across all distinct lists (concrete arrays — trace-safe), and
    the result re-encodes into a LUT gather (reference:
    src/core_functions/scalar/list/list_transform.cpp lambda executor,
    rebuilt on the per-distinct-value invariant). Lambda bodies reference
    only the lambda parameter in round 1 (no outer-column captures).
    """
    from duckdb_tpu.planner.bound import EvalEnv

    is_filter = "filter" in name
    out_t = base.ltype if is_filter else list_of(body_b.ltype)

    def impl(env, cols, node):
        c = cols[0]
        entries = [tuple(t) for t in c.dict_values]
        flat = [v for t in entries for v in t]
        res_vals = []
        if flat:
            data, valid, dvals = _column_from_pyvals(flat, child_t)
            elem = Column(data=jnp.asarray(data), ltype=child_t,
                          validity=jnp.asarray(valid), dict_values=dvals)
            n = len(flat)
            ecols = {pkey: elem}
            if ikey is not None:  # 1-based position within each list
                idxs = np.concatenate([np.arange(1, len(t) + 1)
                                       for t in entries]) if flat else \
                    np.zeros(0, np.int64)
                ecols[ikey] = Column(data=jnp.asarray(
                    idxs.astype(np.int64)), ltype=BIGINT)
            eenv = EvalEnv(cols=ecols, plen=n,
                           live=jnp.ones((n,), jnp.bool_))
            rc = body_b.eval(eenv)
            rdata = np.asarray(jnp.broadcast_to(rc.data, (n,)))
            rvalid = (np.asarray(jnp.broadcast_to(rc.validity, (n,)))
                      if rc.validity is not None else None)
            res_vals = [_py_decode(rc.ltype, rdata, rvalid, rc.dict_values, i)
                        for i in range(n)]
        new_entries = []
        pos = 0
        for t in entries:
            k = len(t)
            if is_filter:
                new_entries.append(tuple(
                    t[i2] for i2 in range(k) if res_vals[pos + i2] is True))
            else:
                new_entries.append(tuple(res_vals[pos:pos + k]))
            pos += k
        inv, dv = encode_objects(new_entries)
        codes = jnp.asarray(inv)[jnp.clip(c.data, 0, max(len(inv) - 1, 0))]
        return Column(data=codes, ltype=out_t, validity=c.validity,
                      dict_values=dv)

    return out_t, impl


def bind_reduce_func(name, base, body_b, akey, xkey, child_t):
    """list_reduce(l, lambda acc, x: ...) — left fold over each distinct
    list (reference: core_functions/scalar/list/list_reduce.cpp). The fold
    runs round-by-round: round k evaluates the body once over the k-th
    element of every distinct list still long enough, so the host cost is
    O(max_len) body evaluations, not O(total elements)."""
    from duckdb_tpu.planner.bound import EvalEnv

    out_t = body_b.ltype

    def impl(env, cols, node):
        c = cols[0]
        entries = [tuple(t) for t in c.dict_values]
        max_len = max((len(t) for t in entries), default=0)
        accs = [t[0] if t else None for t in entries]
        n = len(entries)
        for k in range(1, max_len):
            active = [i for i, t in enumerate(entries) if len(t) > k]
            if not active:
                break
            acc_vals = [accs[i] for i in active]
            x_vals = [entries[i][k] for i in active]
            m = len(active)
            ad, av, advals = _column_from_pyvals(acc_vals, out_t if k > 1
                                                 else child_t)
            xd, xv, xdvals = _column_from_pyvals(x_vals, child_t)
            eenv = EvalEnv(cols={
                akey: Column(data=jnp.asarray(ad), ltype=(out_t if k > 1
                                                          else child_t),
                             validity=jnp.asarray(av), dict_values=advals),
                xkey: Column(data=jnp.asarray(xd), ltype=child_t,
                             validity=jnp.asarray(xv), dict_values=xdvals),
            }, plen=m, live=jnp.ones((m,), jnp.bool_))
            rc = body_b.eval(eenv)
            rdata = np.asarray(jnp.broadcast_to(rc.data, (m,)))
            rvalid = (np.asarray(jnp.broadcast_to(rc.validity, (m,)))
                      if rc.validity is not None else None)
            for j, i in enumerate(active):
                accs[i] = _py_decode(rc.ltype, rdata, rvalid,
                                     rc.dict_values, j)
        for i, t in enumerate(entries):
            if not t:
                accs[i] = None  # reference errors on empty; NULL here
        return _lut_gather(c, accs, out_t)

    return out_t, impl


def _pairwise_list_op(a: "Column", b: "Column", fn, out_t):
    """Per-distinct-PAIR host op over two dict-encoded columns → LUT gather
    on the pair code (a_code * |b_dict| + b_code)."""
    na, nb = max(len(a.dict_values), 1), max(len(b.dict_values), 1)
    entries = [fn(ta, tb) for ta in a.dict_values for tb in b.dict_values] \
        or [fn((), ())]
    inv, dvals = encode_objects(entries)
    pair = (jnp.clip(a.data, 0, na - 1).astype(jnp.int32) * nb
            + jnp.clip(b.data, 0, nb - 1).astype(jnp.int32))
    codes = jnp.asarray(inv)[jnp.clip(pair, 0, max(len(inv) - 1, 0))]
    validity = None
    if a.validity is not None or b.validity is not None:
        va = a.validity if a.validity is not None else jnp.bool_(True)
        vb = b.validity if b.validity is not None else jnp.bool_(True)
        validity = jnp.logical_and(va, vb)
    return Column(data=codes, ltype=out_t, validity=validity,
                  dict_values=dvals)


@register("list_concat")
@register("list_cat")
@register("array_concat")
def _bind_list_concat(arg_exprs):
    for a in arg_exprs:
        if a.ltype.id is not TypeId.LIST:
            raise BindError("list_concat expects LIST arguments")
    out_t = arg_exprs[0].ltype

    def impl(env, cols, node):
        acc = cols[0]
        for c in cols[1:]:
            acc = _pairwise_list_op(acc, c, lambda x, y: tuple(x) + tuple(y),
                                    out_t)
        return acc

    return out_t, impl, arg_exprs


@register("list_append")
@register("array_append")
def _bind_list_append(arg_exprs):
    v, _ = _const_py(arg_exprs[1])
    out_t = arg_exprs[0].ltype
    return out_t, _per_distinct(lambda t: tuple(t) + (v,), out_t), \
        arg_exprs[:1]


@register("list_prepend")
@register("array_prepend")
def _bind_list_prepend(arg_exprs):
    # list_prepend(value, list)
    v, _ = _const_py(arg_exprs[0])
    out_t = arg_exprs[1].ltype
    return out_t, _per_distinct(lambda t: (v,) + tuple(t), out_t, ci=0), \
        arg_exprs[1:]


def _per_distinct(fn, out_t, ci=0):
    def impl(env, cols, node):
        c = cols[ci]
        inv, dvals = encode_objects([fn(t) for t in c.dict_values])
        codes = jnp.asarray(inv)[jnp.clip(c.data, 0,
                                          max(len(inv) - 1, 0))]
        return Column(data=codes, ltype=out_t, validity=c.validity,
                      dict_values=dvals)

    return impl


@register("list_slice")
@register("array_slice")
def _bind_list_slice(arg_exprs):
    # 1-based inclusive bounds (reference: list_slice.cpp)
    a = int(arg_exprs[1].const_value())
    b2 = int(arg_exprs[2].const_value())
    out_t = arg_exprs[0].ltype

    def sl(t):
        lo = a - 1 if a > 0 else len(t) + a
        hi = b2 if b2 > 0 else len(t) + b2 + 1
        return tuple(t[max(lo, 0):max(hi, 0)])

    return out_t, _per_distinct(sl, out_t), arg_exprs[:1]


@register("flatten")
def _bind_flatten(arg_exprs):
    base = arg_exprs[0]
    if (base.ltype.id is not TypeId.LIST
            or (base.ltype.child or SQLNULL).id is not TypeId.LIST):
        raise BindError("flatten expects a LIST of LISTs")
    out_t = base.ltype.child

    def fl(t):
        out = []
        for sub in t:
            if sub is not None:
                out.extend(sub)
        return tuple(out)

    return out_t, _per_distinct(fl, out_t), arg_exprs[:1]


@register("list_position")
@register("list_indexof")
@register("array_position")
def _bind_list_position(arg_exprs):
    needle, _ = _const_py(arg_exprs[1])

    def impl(env, cols, node):
        c = cols[0]
        vals = [(t.index(needle) + 1 if needle in t else None)
                for t in c.dict_values]
        return _lut_gather(c, vals, BIGINT)

    return BIGINT, impl, arg_exprs[:1]


@register("map_pack_kv")
def _bind_map_pack_kv(arg_exprs):
    """MAP {'k': v, ...} literal: entries are (key, value) pair tuples."""
    kt = vt = SQLNULL
    pairs = []
    for i in range(0, len(arg_exprs), 2):
        k, kt_ = _const_py(arg_exprs[i])
        v, vt_ = _const_py(arg_exprs[i + 1])
        if kt.id is TypeId.SQLNULL:
            kt = kt_
        if vt.id is TypeId.SQLNULL:
            vt = vt_
        pairs.append((k, v))
    lt = map_of(kt, vt)
    return lt, _const_column(tuple(pairs), lt), []


@register("map")
def _bind_map(arg_exprs):
    if not arg_exprs:
        lt = map_of(SQLNULL, SQLNULL)
        return lt, _const_column((), lt), []
    ks, kt_l = _const_py(arg_exprs[0])
    vs, vt_l = _const_py(arg_exprs[1])
    lt = map_of(kt_l.child or SQLNULL, vt_l.child or SQLNULL)
    return lt, _const_column(tuple(zip(ks, vs)), lt), []


@register("map_keys")
def _bind_map_keys(arg_exprs):
    base = arg_exprs[0]
    kt = (base.ltype.fields or (("key", SQLNULL),))[0][1]
    out_t = list_of(kt)
    return out_t, _per_distinct(lambda t: tuple(k for k, _ in t), out_t), \
        arg_exprs[:1]


@register("map_values")
def _bind_map_values(arg_exprs):
    base = arg_exprs[0]
    out_t = list_of(base.ltype.child or SQLNULL)
    return out_t, _per_distinct(lambda t: tuple(v for _, v in t), out_t), \
        arg_exprs[:1]


@register("cardinality")
def _bind_cardinality(arg_exprs):
    return _bind_list_length(arg_exprs[:1])


@register("map_contains")
def _bind_map_contains(arg_exprs):
    k, _ = _const_py(arg_exprs[1])

    def impl(env, cols, node):
        c = cols[0]
        lut = np.fromiter((any(kk == k for kk, _ in t)
                           for t in c.dict_values), dtype=np.bool_,
                          count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, max(len(lut) - 1, 0))]
        return Column(data=d, ltype=BOOLEAN, validity=c.validity)

    return BOOLEAN, impl, arg_exprs[:1]


def map_element(arg_exprs):
    """m[k] / element_at(m, k): the value for key k, NULL when absent."""
    base = arg_exprs[0]
    k, _ = _const_py(arg_exprs[1])
    vt = base.ltype.child or SQLNULL

    def impl(env, cols, node):
        c = cols[0]
        vals = [next((v for kk, v in t if kk == k), None)
                for t in c.dict_values]
        return _lut_gather(c, vals, vt)

    return vt, impl, arg_exprs[:1]


REGISTRY["element_at"] = map_element


@register("row")
@register("struct_pack")
def _bind_row(arg_exprs):
    """Positional STRUCT constructor (reference names fields v1..vn,
    core_functions struct_pack.cpp / row())."""
    fields = []
    vals = []
    for i, a in enumerate(arg_exprs):
        v, t = _const_py(a)
        fields.append((getattr(a, "alias", None) or f"v{i + 1}", t))
        vals.append(v)
    lt = struct_of(*fields)
    return lt, _const_column(tuple(vals), lt), []


# -- list_aggregate -----------------------------------------------------------
def _laggr_compute(fname: str, t, sep: str = ","):
    """Apply aggregate `fname` to one python list `t` (NULLs removed first
    except count-like). Mirrors reference list_aggregates.cpp semantics:
    NULL elements are ignored; empty input -> NULL (count -> 0)."""
    import math
    import statistics

    vs = [x for x in t if x is not None]
    if fname == "count":
        return len(vs)
    if fname in ("bool_and", "bool_or"):
        if not vs:
            return None
        bools = [bool(x) for x in vs]
        return all(bools) if fname == "bool_and" else any(bools)
    if not vs:
        return None
    if fname == "sum":
        return sum(vs)
    if fname == "product":
        p = 1
        for x in vs:
            p *= x
        return p
    if fname in ("avg", "mean"):
        return float(sum(float(x) for x in vs)) / len(vs)
    if fname == "min":
        return min(vs)
    if fname == "max":
        return max(vs)
    if fname in ("first", "any_value"):
        return vs[0]
    if fname == "last":
        return vs[-1]
    if fname == "median":
        return float(statistics.median(float(x) for x in vs))
    if fname == "mode":
        return statistics.mode(vs)
    if fname == "mad":
        med = statistics.median(float(x) for x in vs)
        return float(statistics.median(abs(float(x) - med) for x in vs))
    if fname in ("string_agg", "group_concat", "listagg"):
        return sep.join(str(x) for x in vs)
    if fname in ("approx_count_distinct", "count_distinct"):
        return len(set(vs))
    if fname in ("bit_and", "bit_or", "bit_xor"):
        acc = int(vs[0])
        for x in vs[1:]:
            x = int(x)
            acc = (acc & x if fname == "bit_and"
                   else acc | x if fname == "bit_or" else acc ^ x)
        return acc
    fs = [float(x) for x in vs]
    n = len(fs)
    mean = sum(fs) / n
    m2 = sum((x - mean) ** 2 for x in fs)
    if fname in ("var_samp", "variance", "var"):
        return m2 / (n - 1) if n > 1 else None
    if fname == "var_pop":
        return m2 / n
    if fname in ("stddev_samp", "stddev", "std"):
        return math.sqrt(m2 / (n - 1)) if n > 1 else None
    if fname == "stddev_pop":
        return math.sqrt(m2 / n)
    if fname == "sem":
        return (math.sqrt(m2 / (n - 1)) / math.sqrt(n)) if n > 1 else None
    if fname == "skewness":
        if n < 3:
            return None
        s = math.sqrt(m2 / (n - 1))
        if s == 0:
            return None
        m3 = sum((x - mean) ** 3 for x in fs)
        return (n * m3) / ((n - 1) * (n - 2) * s ** 3)
    if fname in ("kurtosis", "kurtosis_pop"):
        if m2 == 0:
            return None
        m4 = sum((x - mean) ** 4 for x in fs)
        if fname == "kurtosis_pop":
            return n * m4 / (m2 * m2) - 3.0
        if n < 4:
            return None
        c = ((n - 1.0) / ((n - 2.0) * (n - 3.0)))
        return c * ((n + 1.0) * n * m4 / (m2 * m2) - 3.0 * (n - 1.0))
    if fname == "entropy":
        from collections import Counter
        counts = Counter(vs)
        tot = float(len(vs))
        return -sum((c / tot) * math.log2(c / tot)
                    for c in counts.values())
    raise BindError(
        f"list_aggregate: unsupported aggregate function {fname!r}")


_LAGGR_CHILD_TYPED = {"min", "max", "first", "last", "any_value", "mode",
                      "sum", "product"}
_LAGGR_BIGINT = {"count", "approx_count_distinct", "count_distinct",
                 "bit_and", "bit_or", "bit_xor"}
_LAGGR_BOOL = {"bool_and", "bool_or"}
_LAGGR_VARCHAR = {"string_agg", "group_concat", "listagg"}


@register("aggregate")
@register("list_aggr")
@register("list_aggregate")
def _bind_list_aggregate(arg_exprs):
    """list_aggregate(l, 'name'): apply an aggregate to each list value —
    one host evaluation per DISTINCT list, device LUT gather after
    (reference: core_functions/scalar/list/list_aggregates.cpp)."""
    from duckdb_tpu.planner.binder import BindError

    lt0 = arg_exprs[0].ltype
    if lt0.id not in (TypeId.LIST, TypeId.SQLNULL):
        raise BindError(
            "Binder Error: No function matches the given name and argument "
            f"types 'list_aggregate({lt0}, VARCHAR)'. You might need to add "
            "explicit type casts.")
    fname = str(arg_exprs[1].const_value()).lower()
    child = getattr(lt0, "child", None) or SQLNULL
    sep = (str(arg_exprs[2].const_value())
           if len(arg_exprs) > 2 and fname in _LAGGR_VARCHAR else ",")
    if fname in _LAGGR_BIGINT:
        rt = BIGINT
    elif fname in _LAGGR_BOOL:
        rt = BOOLEAN
    elif fname in _LAGGR_VARCHAR:
        rt = VARCHAR
    elif fname in _LAGGR_CHILD_TYPED:
        rt = child if child.id is not TypeId.SQLNULL else BIGINT
    else:
        rt = DOUBLE
    # probe now so unsupported names fail at bind time, like the reference
    _laggr_compute(fname, (1,), sep)

    def impl(env, cols, node):
        c = cols[0]
        results = [_laggr_compute(fname, t, sep) for t in c.dict_values]
        valid_h = np.array([r is not None for r in results], dtype=bool)
        if rt.id is TypeId.VARCHAR:
            uniq, inv = np.unique(
                np.array(["" if r is None else str(r) for r in results],
                         dtype=str), return_inverse=True)
            lut = jnp.asarray(inv.astype(np.int32))
            data = lut[jnp.clip(c.data, 0, max(len(results) - 1, 0))]
            dvals = uniq.astype(object)
        elif rt.id is TypeId.BOOLEAN:
            lut = jnp.asarray(np.array([bool(r) for r in results],
                                       dtype=bool))
            data = lut[jnp.clip(c.data, 0, max(len(results) - 1, 0))]
            dvals = None
        elif rt.id is TypeId.DECIMAL:
            arr = np.array([0 if r is None
                            else int(pydec.Decimal(r).scaleb(rt.scale)
                                     .to_integral_value())
                            for r in results], dtype=np.int64)
            data = jnp.asarray(arr)[jnp.clip(c.data, 0,
                                             max(len(results) - 1, 0))]
            dvals = None
        elif rt.is_float:
            arr = np.array([np.nan if r is None else float(r)
                            for r in results], dtype=np.float64)
            data = jnp.asarray(arr)[jnp.clip(c.data, 0,
                                             max(len(results) - 1, 0))]
            dvals = None
        else:
            arr = np.array([0 if r is None else int(r) for r in results],
                           dtype=np.int64)
            data = jnp.asarray(arr)[jnp.clip(c.data, 0,
                                             max(len(results) - 1, 0))]
            dvals = None
        pv = jnp.asarray(valid_h)[jnp.clip(c.data, 0,
                                           max(len(results) - 1, 0))]
        validity = (pv if c.validity is None
                    else jnp.logical_and(c.validity, pv))
        return Column(data=data, ltype=rt, validity=validity,
                      dict_values=dvals)

    return rt, impl, arg_exprs[:1]


# -- ENUM metadata functions --------------------------------------------------
# Reference: src/core_functions/scalar/enum/enum_functions.cpp. Our enums are
# dictionary values registered in the catalog (binder.ACTIVE_USER_TYPES);
# these functions read that dictionary at bind time, so they fold to
# constants — zero device work.

def _enum_values_of(b):
    from duckdb_tpu.planner import binder as _bd
    from duckdb_tpu.planner.functions import BindError

    name = getattr(b, "enum_type", None)
    ut = _bd.ACTIVE_USER_TYPES.get(name) if name else None
    if ut is None or ut.get("kind") != "enum":
        raise BindError("this function expects an ENUM-typed argument "
                        "(e.g. enum_range(NULL::mood))")
    return list(ut["values"])


@register("enum_range")
def _bind_enum_range(arg_exprs):
    vals = _enum_values_of(arg_exprs[0])
    lt = list_of(VARCHAR)
    return lt, _const_column(tuple(vals), lt), []


@register("enum_first")
def _bind_enum_first(arg_exprs):
    vals = _enum_values_of(arg_exprs[0])
    return VARCHAR, _const_column(vals[0], VARCHAR), []


@register("enum_last")
def _bind_enum_last(arg_exprs):
    vals = _enum_values_of(arg_exprs[0])
    return VARCHAR, _const_column(vals[-1], VARCHAR), []


@register("enum_code")
def _bind_enum_code(arg_exprs):
    vals = _enum_values_of(arg_exprs[0])
    code = {v: i for i, v in enumerate(vals)}

    def impl(env, cols, node):
        c = cols[0]
        lut = np.fromiter((code.get(s, -1) for s in c.dict_values),
                          dtype=np.int64, count=len(c.dict_values))
        d = jnp.asarray(lut)[jnp.clip(c.data, 0, max(len(lut) - 1, 0))]
        return Column(data=d, ltype=BIGINT, validity=c.validity)
    return BIGINT, impl, arg_exprs


@register("enum_range_boundary")
def _bind_enum_range_boundary(arg_exprs):
    vals = _enum_values_of(arg_exprs[0] if getattr(arg_exprs[0], "enum_type",
                                                   None) else arg_exprs[1])
    lo = arg_exprs[0].const_value() if arg_exprs[0].is_const() else None
    hi = arg_exprs[1].const_value() if arg_exprs[1].is_const() else None
    i = vals.index(lo) if lo is not None else 0
    j = vals.index(hi) if hi is not None else len(vals) - 1
    lt = list_of(VARCHAR)
    return lt, _const_column(tuple(vals[i:j + 1]), lt), []


@register("range")
@register("generate_series")
def _bind_range_list(arg_exprs):
    """Scalar list-returning range (the FROM-clause table function is
    resolved separately). Reference: core_functions/scalar/list/range.cpp:
    range excludes the stop bound, generate_series includes it."""
    from duckdb_tpu.planner.functions import BindError

    if not all(a.is_const() for a in arg_exprs):
        raise BindError("scalar range()/generate_series() requires "
                        "constant arguments")
    vals = [a.const_value() for a in arg_exprs]
    if len(vals) == 1:
        start, stop, step = 0, vals[0], 1
    elif len(vals) == 2:
        (start, stop), step = vals, 1
    else:
        start, stop, step = vals
    if step == 0:
        raise BindError("step of range cannot be 0")
    inclusive = 1 if step > 0 else -1
    lt = list_of(BIGINT)
    entry = tuple(range(int(start), int(stop), int(step)))
    return lt, _const_column(entry, lt), []


def _fix_generate_series():
    """generate_series includes its stop bound; re-register with that."""
    base = REGISTRY["range"]

    def binder(arg_exprs):
        from duckdb_tpu.planner.functions import BindError

        if not all(a.is_const() for a in arg_exprs):
            raise BindError("scalar generate_series() requires constant "
                            "arguments")
        vals = [a.const_value() for a in arg_exprs]
        if len(vals) == 1:
            start, stop, step = 0, vals[0], 1
        elif len(vals) == 2:
            (start, stop), step = vals, 1
        else:
            start, stop, step = vals
        if step == 0:
            raise BindError("step of generate_series cannot be 0")
        end = int(stop) + (1 if step > 0 else -1)
        lt = list_of(BIGINT)
        entry = tuple(range(int(start), end, int(step)))
        return lt, _const_column(entry, lt), []
    REGISTRY["generate_series"] = binder


_fix_generate_series()


# -- UNION / BIT / fixed ARRAY ------------------------------------------------
# Reference: src/function/scalar/union/, src/common/types/bit.cpp,
# core_functions/scalar/array/. All three families ride the dictionary
# plane: values transform once per DISTINCT entry on the host and reach
# the device as one LUT gather (the engine's nested-type idiom).

def _union_fields(t: LogicalType):
    if t.id is not TypeId.UNION or not t.fields:
        raise BindError("expected a UNION argument")
    return list(t.fields)


@register("union_value")
def _bind_union_value(arg_exprs):
    if len(arg_exprs) != 1:
        raise BindError("union_value takes exactly one tag := value")
    a = arg_exprs[0]
    tag = getattr(a, "alias", None)
    if tag is None:
        raise BindError("union_value requires a named argument (tag := v)")
    from duckdb_tpu.types import union_of

    lt = union_of((tag, a.ltype))

    def impl(env, cols, node):
        from duckdb_tpu.planner.bound import _coerce_to

        return _coerce_to(cols[0], lt, env)

    return lt, impl, arg_exprs


@register("union_tag")
def _bind_union_tag(arg_exprs):
    fields = _union_fields(arg_exprs[0].ltype)
    names = [n for n, _ in fields]

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather(c, [names[t[0]] if t else None
                               for t in c.dict_values], VARCHAR)

    return VARCHAR, impl, arg_exprs[:1]


@register("union_extract")
def _bind_union_extract(arg_exprs):
    fields = _union_fields(arg_exprs[0].ltype)
    name = str(arg_exprs[1].const_value()).lower()
    for ki, (fname, ftype) in enumerate(fields):
        if fname.lower() == name:
            break
    else:
        raise BindError(f'union has no member "{name}"')

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather(c, [t[1] if t and t[0] == ki else None
                               for t in c.dict_values], ftype)

    return ftype, impl, arg_exprs[:1]


@register("array_value")
def _bind_array_value(arg_exprs):
    """Fixed-size ARRAY constructor (reference array_value.cpp)."""
    from duckdb_tpu.types import array_of, max_logical_type

    if not arg_exprs:
        raise BindError("array_value requires at least one element")
    ct = arg_exprs[0].ltype
    for a in arg_exprs[1:]:
        ct = max_logical_type(ct, a.ltype)
    lt = array_of(ct, len(arg_exprs))
    lv = REGISTRY["list_value"](arg_exprs)

    def impl(env, cols, node, _lv_impl=lv[1]):
        c = _lv_impl(env, cols, node)
        return Column(data=c.data, ltype=lt, validity=c.validity,
                      dict_values=c.dict_values)

    return lt, impl, lv[2]


def _bit_str(a) -> str:
    return str(a)


def bind_get_bit_typed(arg_exprs):
    idx = int(arg_exprs[1].const_value())

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather(c, [int(str(t)[idx]) if 0 <= idx < len(str(t))
                               else None for t in c.dict_values], INTEGER)

    return INTEGER, impl, arg_exprs[:1]


def bind_set_bit_typed(arg_exprs):
    from duckdb_tpu.types import BIT

    idx = int(arg_exprs[1].const_value())
    nv = int(arg_exprs[2].const_value())

    def impl(env, cols, node):
        def setb(t):
            s = str(t)
            if not (0 <= idx < len(s)):
                return None
            return s[:idx] + str(nv & 1) + s[idx + 1:]

        c = cols[0]
        return _lut_gather(c, [setb(t) for t in c.dict_values], BIT)

    return BIT, impl, arg_exprs[:1]


def bind_bit_position_typed(arg_exprs):
    """1-based position of the substring bitstring, 0 when absent."""
    sub = str(arg_exprs[0].const_value())

    def impl(env, cols, node):
        c = cols[0]
        return _lut_gather(c, [str(t).find(sub) + 1
                               for t in c.dict_values], INTEGER)

    return INTEGER, impl, arg_exprs[1:]


def bind_bitstring_typed(arg_exprs):
    """bitstring(s, n): zero-extend the bitstring s to length n."""
    from duckdb_tpu.types import BIT

    n = int(arg_exprs[1].const_value())

    def impl(env, cols, node):
        def pad(t):
            s = str(t)
            if len(s) > n:
                return None
            return "0" * (n - len(s)) + s

        c = cols[0]
        return _lut_gather(c, [pad(t) for t in c.dict_values], BIT)

    return BIT, impl, arg_exprs[:1]
