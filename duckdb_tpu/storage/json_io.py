"""JSON ingest + scalar JSON functions.

Parity target: the reference's json extension (/root/reference/extension/
json/ — read_json table function with schema inference, 60+ functions).
read_json handles newline-delimited JSON and top-level arrays; schema
inference unions keys over a sample and narrows types. JSON values live
as VARCHAR dictionary entries, so every json_* scalar function runs once
per DISTINCT document on the host and becomes a device LUT gather — the
dictionary execution model doing for JSON what the reference's shredded
VARIANT does.
"""

from __future__ import annotations

import json
from typing import List, Tuple

import numpy as np

from duckdb_tpu.types import (
    BIGINT, BOOLEAN, DOUBLE, VARCHAR, LogicalType, TypeId,
)


def _infer_type(values) -> LogicalType:
    vals = [v for v in values if v is not None]
    if not vals:
        return VARCHAR
    if all(isinstance(v, bool) for v in vals):
        return BOOLEAN
    if all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
        return BIGINT
    if all(isinstance(v, (int, float)) and not isinstance(v, bool)
           for v in vals):
        return DOUBLE
    return VARCHAR


def read_json_file(path: str):
    """→ (schema [(name, type)], cols {name: (values, validity, dict)})."""
    with open(path) as f:
        text = f.read().strip()
    if text.startswith("["):
        docs = json.loads(text)
    else:
        docs = [json.loads(line) for line in text.splitlines() if line.strip()]
    keys: List[str] = []
    for d in docs:
        for k in d:
            if k not in keys:
                keys.append(k)
    schema = []
    cols = {}
    for k in keys:
        raw = [d.get(k) for d in docs]
        t = _infer_type(raw)
        validity = np.array([v is not None for v in raw], dtype=bool)
        if t.id is TypeId.VARCHAR:
            strs = np.array(
                ["" if v is None
                 else (v if isinstance(v, str)
                       else json.dumps(v, separators=(",", ":")))
                 for v in raw], dtype=object)
            uniq, codes = np.unique(strs.astype(str), return_inverse=True)
            cols[k] = (codes.astype(np.int32),
                       None if validity.all() else validity,
                       uniq.astype(object))
        elif t.id is TypeId.BOOLEAN:
            cols[k] = (np.array([bool(v) for v in raw], dtype=bool),
                       None if validity.all() else validity, None)
        elif t.id is TypeId.BIGINT:
            cols[k] = (np.array([0 if v is None else int(v) for v in raw],
                                dtype=np.int64),
                       None if validity.all() else validity, None)
        else:
            cols[k] = (np.array([0.0 if v is None else float(v) for v in raw],
                                dtype=np.float64),
                       None if validity.all() else validity, None)
        schema.append((k, t))
    return schema, cols, len(docs)


# -- path evaluation ----------------------------------------------------------
class _Missing:
    """Sentinel: path not present (distinct from JSON null, which is a
    present value — reference: yyjson pointer semantics)."""


MISSING = _Missing()


def json_path_get(doc: str, path: str):
    """Evaluate a JSONPath-lite ($.a.b[0]) or simple-key path. → python value,
    None for JSON null, or MISSING when the path is absent (parity:
    reference GetPath, json_functions/json_extract.cpp)."""
    try:
        v = json.loads(doc)
    except (ValueError, TypeError):
        return MISSING
    if path.startswith("$"):
        parts = []
        buf = ""
        i = 1
        while i < len(path):
            ch = path[i]
            if ch == ".":
                if buf:
                    parts.append(buf)
                    buf = ""
            elif ch == "[":
                if buf:
                    parts.append(buf)
                    buf = ""
                j = path.index("]", i)
                tok = path[i + 1:j]
                if tok.startswith("#"):
                    # yyjson last-element syntax: [#] (one past end),
                    # [#-1] (last), ...
                    parts.append(("#", int(tok[1:]) if tok[1:] else 0))
                else:
                    parts.append(int(tok))
                i = j
            else:
                buf += ch
            i += 1
        if buf:
            parts.append(buf)
    elif path.startswith("/"):
        parts = [p for p in path.split("/") if p]
        parts = [int(p) if p.lstrip("-").isdigit() else p for p in parts]
    else:
        parts = [path]
    for p in parts:
        try:
            if isinstance(p, tuple):  # ('#', offset): relative to length
                if not isinstance(v, list):
                    return MISSING
                idx = len(v) + p[1]
                if idx < 0 or idx >= len(v):
                    return MISSING
                v = v[idx]
            elif isinstance(p, int):
                v = v[p]
            elif isinstance(v, dict):
                v = v[p]
            else:
                return MISSING
        except (KeyError, IndexError, TypeError):
            return MISSING
    return v


def _dumps(v):
    return json.dumps(v, separators=(",", ":"))


def _py_to_jsonable(v, lt=None):
    """Engine-level python value → json-serializable value."""
    import datetime
    import decimal as pydec

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, pydec.Decimal):
        f = float(v)
        return int(v) if f.is_integer() else f
    if isinstance(v, (datetime.date, datetime.datetime, datetime.time)):
        return str(v)
    if isinstance(v, tuple):
        if lt is not None and lt.id is TypeId.STRUCT and lt.fields:
            return {fn: _py_to_jsonable(x, ft)
                    for (fn, ft), x in zip(lt.fields, v)}
        child = lt.child if lt is not None else None
        return [_py_to_jsonable(x, child) for x in v]
    return str(v)


def register_json_functions():
    import jax.numpy as jnp

    from duckdb_tpu.blocks import Column
    from duckdb_tpu.planner.functions import (REGISTRY, dict_predicate,
                                              dict_transform)

    def _host_cols(env, cols):
        """Concretize columns to per-row python values (eager contract:
        raises ConcretizationTypeError under jit → eager fallback)."""
        from duckdb_tpu.planner.functions_nested import _py_decode

        out = []
        for c in cols:
            data = np.asarray(jnp.broadcast_to(c.data, (env.plen,)))
            valid = (np.asarray(jnp.broadcast_to(c.validity, (env.plen,)))
                     if c.validity is not None else None)
            vals = [_py_decode(c.ltype, data, valid, c.dict_values, i)
                    for i in range(env.plen)]
            out.append((vals, c.ltype))
        return out

    def _encode_strs(strs, plen):
        """Per-row python str-or-None list → VARCHAR Column."""
        valid = np.array([s is not None for s in strs], dtype=bool)
        arr = np.array(["" if s is None else s for s in strs], dtype=object)
        uniq, codes = np.unique(arr.astype(str), return_inverse=True)
        return Column(data=jnp.asarray(codes.astype(np.int32)),
                      ltype=VARCHAR,
                      validity=None if valid.all() else jnp.asarray(valid),
                      dict_values=uniq.astype(object))

    def _rowwise_json(fn):
        """Binder for an n-ary host row-wise JSON fn returning str/None."""
        def binder(arg_exprs):
            def impl(env, cols, node):
                hosts = _host_cols(env, cols)
                n = env.plen
                strs = [fn(*[h[0][i] for h in hosts]) for i in range(n)]
                return _encode_strs(strs, n)
            return VARCHAR, impl, arg_exprs
        return binder

    # -- extraction -----------------------------------------------------------
    def _rowwise_path(arg_exprs, f2):
        """Non-constant path: evaluate doc/path pairs row-wise host-side."""
        def impl(env, cols, node):
            hosts = _host_cols(env, cols)
            strs = [None if hosts[0][0][i] is None or hosts[1][0][i] is None
                    else f2(hosts[0][0][i], hosts[1][0][i])
                    for i in range(env.plen)]
            return _encode_strs(strs, env.plen)
        return impl

    def _list_paths_binder(arg_exprs, f2, child_lt):
        """Constant LIST of paths: result is a LIST column (one element per
        path), reference json_extract('doc', ['p1','p2'])."""
        from duckdb_tpu.planner.functions_nested import encode_objects
        from duckdb_tpu.types import list_of

        lt = list_of(child_lt)

        def impl(env, cols, node):
            pc = cols[1]
            paths = tuple(pc.dict_values[int(np.asarray(pc.data)[0] if
                                             hasattr(pc.data, "shape") and
                                             pc.data.shape else pc.data)])
            c = cols[0]
            if c.dict_values is None:  # typed-NULL document
                return Column(data=jnp.zeros_like(c.data), ltype=lt,
                              validity=jnp.zeros(c.data.shape, jnp.bool_),
                              dict_values=np.array([()], dtype=object))
            outs = [tuple(f2(s, p) for p in paths) for s in c.dict_values]
            codes_h, dvals = encode_objects(outs)
            nd = max(len(outs), 1)
            codes = jnp.clip(c.data, 0, nd - 1)
            data = jnp.asarray(codes_h.astype(np.int32))[codes]
            return Column(data=data, ltype=lt, validity=c.validity,
                          dict_values=dvals)
        return lt, impl, arg_exprs

    def _make_extract(as_text: bool):
        def binder(arg_exprs):
            def f2(s, p):
                v = json_path_get(s, p if isinstance(p, str) else f"$[{p}]")
                if v is MISSING:
                    return None
                if v is None:
                    return None if as_text else "null"
                if as_text:
                    return v if isinstance(v, str) else _dumps(v)
                return _dumps(v)
            try:
                path_cv = arg_exprs[1].const_value()
            except Exception:  # noqa: BLE001 — per-row path expression
                if arg_exprs[1].ltype.id is TypeId.LIST:
                    return _list_paths_binder(arg_exprs, f2, VARCHAR)
                return VARCHAR, _rowwise_path(arg_exprs, f2), arg_exprs
            path = (int(path_cv) if not isinstance(path_cv, str)
                    else str(path_cv))

            def f(s):
                return f2(s, path)

            def impl(env, cols, node):
                c = cols[0]
                outs = [f(s) for s in c.dict_values]
                valid_h = np.array([o is not None for o in outs], dtype=bool)
                arr = np.array(["" if o is None else o for o in outs],
                               dtype=object)
                uniq, inv = np.unique(arr.astype(str), return_inverse=True)
                nd = max(len(outs), 1)
                codes = jnp.clip(c.data, 0, nd - 1)
                data = jnp.asarray(inv.astype(np.int32))[codes]
                pv = jnp.asarray(valid_h)[codes]
                validity = (pv if c.validity is None
                            else jnp.logical_and(c.validity, pv))
                return Column(data=data, ltype=VARCHAR, validity=validity,
                              dict_values=uniq.astype(object))
            return VARCHAR, impl, arg_exprs[:1]
        return binder

    # json_extract returns JSON text (strings stay quoted); the _string
    # variants unquote (reference: json_functions/json_extract.cpp)
    REGISTRY["json_extract"] = _make_extract(as_text=False)
    REGISTRY["json_extract_path"] = _make_extract(as_text=False)
    REGISTRY["json_extract_string"] = _make_extract(as_text=True)
    REGISTRY["json_extract_path_text"] = _make_extract(as_text=True)

    def _bind_json_value(arg_exprs):
        """json_value: like extract but NULL for objects/arrays
        (reference: json_functions/json_value.cpp)."""
        def vf2(s, p):
            v = json_path_get(s, p if isinstance(p, str) else f"$[{p}]")
            if v is MISSING or v is None or isinstance(v, (dict, list)):
                return None
            return _dumps(v)
        try:
            pcv = arg_exprs[1].const_value()
        except Exception:  # noqa: BLE001
            if arg_exprs[1].ltype.id is TypeId.LIST:
                return _list_paths_binder(arg_exprs, vf2, VARCHAR)
            return VARCHAR, _rowwise_path(arg_exprs, vf2), arg_exprs
        path = f"$[{pcv}]" if not isinstance(pcv, str) else str(pcv)

        def impl(env, cols, node):
            c = cols[0]

            def f(s):
                # scalar-only extract, result is JSON text (strings quoted)
                v = json_path_get(s, path)
                if v is MISSING or v is None or isinstance(v, (dict, list)):
                    return None
                return _dumps(v)
            outs = [f(s) for s in c.dict_values]
            valid_h = np.array([o is not None for o in outs], dtype=bool)
            arr = np.array(["" if o is None else o for o in outs],
                           dtype=object)
            uniq, inv = np.unique(arr.astype(str), return_inverse=True)
            nd = max(len(outs), 1)
            codes = jnp.clip(c.data, 0, nd - 1)
            data = jnp.asarray(inv.astype(np.int32))[codes]
            pv = jnp.asarray(valid_h)[codes]
            validity = (pv if c.validity is None
                        else jnp.logical_and(c.validity, pv))
            return Column(data=data, ltype=VARCHAR, validity=validity,
                          dict_values=uniq.astype(object))
        return VARCHAR, impl, arg_exprs[:1]

    REGISTRY["json_value"] = _bind_json_value

    # -- construction ---------------------------------------------------------
    def _bind_to_json(arg_exprs):
        """to_json/json_quote: any value → JSON text (reference:
        json_functions/json_create.cpp ToJson)."""
        lt = arg_exprs[0].ltype

        def impl(env, cols, node):
            hosts = _host_cols(env, cols)
            vals, vlt = hosts[0]
            strs = [None if v is None else _dumps(_py_to_jsonable(v, vlt))
                    for v in vals]
            return _encode_strs(strs, env.plen)
        return VARCHAR, impl, arg_exprs

    for _n in ("to_json", "json_quote", "row_to_json", "array_to_json"):
        REGISTRY[_n] = _bind_to_json

    def _bind_json_parse(arg_exprs):
        """json(x): parse + minify (errors on invalid JSON, reference
        json_create.cpp JSONFunction)."""
        def impl(env, cols, node):
            def f(s):
                return _dumps(json.loads(s))
            return dict_transform(cols[0], f)
        return VARCHAR, impl, arg_exprs

    REGISTRY["json"] = _bind_json_parse

    def _json_object(*kv):
        obj = {}
        for i in range(0, len(kv) - 1, 2):
            if kv[i] is None:
                continue
            obj[str(kv[i])] = _py_to_jsonable(kv[i + 1])
        return _dumps(obj)

    def _json_array(*vals):
        return _dumps([_py_to_jsonable(v) for v in vals])

    REGISTRY["json_object"] = _rowwise_json(_json_object)
    REGISTRY["json_array"] = _rowwise_json(_json_array)

    def _merge_patch(*docs):
        # RFC 7386 merge patch, variadic like the reference
        # (json_merge_patch.cpp folds left)
        if len(docs) > 2:
            acc = docs[0]
            for d in docs[1:]:
                acc = _merge_patch(acc, d)
            return acc
        a, b = docs
        if b is None:
            return None  # SQL NULL patch → NULL result (reference)
        if a is None:
            a = "null"  # NULL target: the patch wins

        def patch(t, p):
            if not isinstance(p, dict):
                return p
            t = t if isinstance(t, dict) else {}
            # key order matches yyjson_merge_patch: unpatched target keys
            # first, then patch keys in patch order
            out = {k: v for k, v in t.items() if k not in p}
            for k, v in p.items():
                if v is None:
                    continue
                out[k] = patch(t.get(k), v)
            return out
        try:
            return _dumps(patch(json.loads(a), json.loads(b)))
        except (ValueError, TypeError):
            return None

    REGISTRY["json_merge_patch"] = _rowwise_json(_merge_patch)

    def _contains(hay, needle):
        if hay is None or needle is None:
            return None
        try:
            h, n = json.loads(hay), json.loads(needle)
        except (ValueError, TypeError):
            return None

        def contains_at(hv, nv):
            # structural containment (yyjson semantics): objects match on a
            # key-subset basis, arrays element-subset
            if isinstance(hv, dict) and isinstance(nv, dict):
                return all(k in hv and contains_at(hv[k], nv[k]) for k in nv)
            if isinstance(hv, list):
                if isinstance(nv, list):
                    return all(any(contains_at(he, ne) for he in hv)
                               for ne in nv)
                return any(contains_at(he, nv) for he in hv)
            return hv == nv

        def walk(v):
            if contains_at(v, n):
                return True
            if isinstance(v, dict):
                return any(walk(x) for x in v.values())
            if isinstance(v, list):
                return any(walk(x) for x in v)
            return False
        return walk(h)

    def _bind_json_contains(arg_exprs):
        def impl(env, cols, node):
            hosts = _host_cols(env, cols)
            n = env.plen
            outs = [_contains(hosts[0][0][i], hosts[1][0][i])
                    for i in range(n)]
            valid = np.array([o is not None for o in outs], dtype=bool)
            data = jnp.asarray(np.array([bool(o) for o in outs], dtype=bool))
            return Column(data=data, ltype=BOOLEAN,
                          validity=None if valid.all()
                          else jnp.asarray(valid))
        return BOOLEAN, impl, arg_exprs

    REGISTRY["json_contains"] = _bind_json_contains

    def _bind_json_exists(arg_exprs):
        try:
            path = str(arg_exprs[1].const_value())
        except Exception:  # noqa: BLE001 — per-row path expression
            if arg_exprs[1].ltype.id is TypeId.LIST:
                return _list_paths_binder(
                    arg_exprs,
                    lambda s, p: json_path_get(s, p) is not MISSING,
                    BOOLEAN)

            def impl_rw(env, cols, node):
                hosts = _host_cols(env, cols)
                outs = [None if hosts[0][0][i] is None
                        or hosts[1][0][i] is None
                        else json_path_get(hosts[0][0][i],
                                           hosts[1][0][i]) is not MISSING
                        for i in range(env.plen)]
                valid = np.array([o is not None for o in outs], dtype=bool)
                import jax.numpy as _jnp

                return Column(
                    data=_jnp.asarray(np.array([bool(o) for o in outs],
                                               dtype=bool)),
                    ltype=BOOLEAN,
                    validity=None if valid.all() else _jnp.asarray(valid))
            return BOOLEAN, impl_rw, arg_exprs

        def impl(env, cols, node):
            return dict_predicate(
                cols[0], lambda s: json_path_get(s, path) is not MISSING)
        return BOOLEAN, impl, arg_exprs[:1]

    REGISTRY["json_exists"] = _bind_json_exists

    # -- transformation -------------------------------------------------------
    def _bind_json_pretty(arg_exprs):
        def impl(env, cols, node):
            def f(s):
                try:
                    return json.dumps(json.loads(s), indent=4)
                except (ValueError, TypeError):
                    return s
            return dict_transform(cols[0], f)
        return VARCHAR, impl, arg_exprs

    REGISTRY["json_pretty"] = _bind_json_pretty

    def _strip_nulls(v):
        if isinstance(v, dict):
            return {k: _strip_nulls(x) for k, x in v.items() if x is not None}
        if isinstance(v, list):
            return [_strip_nulls(x) for x in v]
        return v

    def _bind_json_strip_nulls(arg_exprs):
        def impl(env, cols, node):
            def f(s):
                try:
                    return _dumps(_strip_nulls(json.loads(s)))
                except (ValueError, TypeError):
                    return s
            return dict_transform(cols[0], f)
        return VARCHAR, impl, arg_exprs

    REGISTRY["json_strip_nulls"] = _bind_json_strip_nulls

    def _jtype(v):
        # scalar type names match yyjson-backed inference: non-negative
        # integers are UBIGINT (reference json_common.hpp ValType)
        if isinstance(v, bool):
            return "BOOLEAN"
        if isinstance(v, int):
            return "UBIGINT" if v >= 0 else "BIGINT"
        if isinstance(v, float):
            return "DOUBLE"
        if isinstance(v, str):
            return "VARCHAR"
        return "NULL"

    def _structure(v):
        if isinstance(v, dict):
            return {k: _structure(x) for k, x in v.items()}
        if isinstance(v, list):
            inner = [_structure(x) for x in v]
            nn = [x for x in inner if x != "NULL"]
            first = nn[0] if nn else "NULL"
            # NULL unifies with any element type (reference structure
            # inference, json_structure.cpp)
            if all(x == first or x == "NULL" for x in inner):
                return [first]
            return inner
        return _jtype(v)

    def _bind_json_structure(arg_exprs):
        def impl(env, cols, node):
            def f(s):
                return _dumps(_structure(json.loads(s)))
            return dict_transform(cols[0], f)
        return VARCHAR, impl, arg_exprs

    REGISTRY["json_structure"] = _bind_json_structure

    def _bind_json_valid(arg_exprs):
        def impl(env, cols, node):
            def f(s):
                try:
                    json.loads(s)
                    return True
                except (ValueError, TypeError):
                    return False
            return dict_predicate(cols[0], f)
        return BOOLEAN, impl, arg_exprs

    REGISTRY["json_valid"] = _bind_json_valid

    def _doc_at_path(arg_exprs):
        """→ fn(s) yielding the (sub)document at the optional path arg."""
        if len(arg_exprs) > 1:
            path = str(arg_exprs[1].const_value())
            return lambda s: json_path_get(s, path)

        def whole(s):
            try:
                return json.loads(s)
            except (ValueError, TypeError):
                return MISSING
        return whole

    def _nullable_int_impl(get, f):
        """Per-distinct int-or-None via LUT gather with validity."""
        def impl(env, cols, node):
            c = cols[0]
            outs = [f(get(s)) for s in c.dict_values]
            valid_h = np.array([o is not None for o in outs], dtype=bool)
            arr = np.array([0 if o is None else o for o in outs],
                           dtype=np.int64)
            nd = max(len(outs), 1)
            codes = jnp.clip(c.data, 0, nd - 1)
            data = jnp.asarray(arr)[codes]
            pv = jnp.asarray(valid_h)[codes]
            validity = (pv if c.validity is None
                        else jnp.logical_and(c.validity, pv))
            return Column(data=data, ltype=BIGINT, validity=validity)
        return impl

    def _bind_json_array_length(arg_exprs):
        get = _doc_at_path(arg_exprs)

        def f(v):
            if v is MISSING:
                return None
            return len(v) if isinstance(v, list) else 0
        return BIGINT, _nullable_int_impl(get, f), arg_exprs[:1]

    REGISTRY["json_array_length"] = _bind_json_array_length

    def _bind_json_keys(arg_exprs):
        """json_keys → VARCHAR[] (reference returns a LIST, not JSON
        text: json_functions/json_keys.cpp)."""
        from duckdb_tpu.planner.functions_nested import encode_objects
        from duckdb_tpu.types import list_of

        get = _doc_at_path(arg_exprs)
        lt = list_of(VARCHAR)

        def impl(env, cols, node):
            c = cols[0]
            if c.dict_values is None:  # typed-NULL input
                return Column(data=jnp.zeros_like(c.data), ltype=lt,
                              validity=jnp.zeros(c.data.shape, jnp.bool_),
                              dict_values=np.array([()], dtype=object))
            outs = []
            for s in c.dict_values:
                v = get(s)
                if isinstance(v, dict):
                    outs.append(tuple(v.keys()))
                elif v is MISSING:
                    outs.append(None)
                else:
                    outs.append(())  # non-object: empty key list (reference)
            valid_h = np.array([o is not None for o in outs], dtype=bool)
            codes_h, dvals = encode_objects(
                [o if o is not None else () for o in outs])
            nd = max(len(outs), 1)
            codes = jnp.clip(c.data, 0, nd - 1)
            data = jnp.asarray(codes_h.astype(np.int32))[codes]
            pv = jnp.asarray(valid_h)[codes]
            validity = (pv if c.validity is None
                        else jnp.logical_and(c.validity, pv))
            return Column(data=data, ltype=lt, validity=validity,
                          dict_values=dvals)
        return lt, impl, arg_exprs[:1]

    REGISTRY["json_keys"] = _bind_json_keys

    def _bind_json_type(arg_exprs):
        get = _doc_at_path(arg_exprs)

        def impl(env, cols, node):
            c0 = cols[0]
            if c0.dict_values is None:  # typed-NULL input
                return Column(data=jnp.zeros_like(c0.data), ltype=VARCHAR,
                              validity=jnp.zeros(c0.data.shape, jnp.bool_),
                              dict_values=np.array([""], dtype=object))
            outs = []
            for s in cols[0].dict_values:
                v = get(s)
                if v is MISSING:
                    outs.append(None)
                elif isinstance(v, dict):
                    outs.append("OBJECT")
                elif isinstance(v, list):
                    outs.append("ARRAY")
                else:
                    outs.append(_jtype(v))
            return _json_type_col(cols[0], outs, env)
        return VARCHAR, impl, arg_exprs[:1]

    def _json_type_col(c, outs, env):
        valid_h = np.array([o is not None for o in outs], dtype=bool)
        arr = np.array(["" if o is None else o for o in outs], dtype=object)
        uniq, inv = np.unique(arr.astype(str), return_inverse=True)
        nd = max(len(outs), 1)
        codes = jnp.clip(c.data, 0, nd - 1)
        data = jnp.asarray(inv.astype(np.int32))[codes]
        pv = jnp.asarray(valid_h)[codes]
        validity = (pv if c.validity is None
                    else jnp.logical_and(c.validity, pv))
        return Column(data=data, ltype=VARCHAR, validity=validity,
                      dict_values=uniq.astype(object))

    REGISTRY["json_type"] = _bind_json_type
    REGISTRY["json_typeof"] = _bind_json_type


register_json_functions()
