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
def json_path_get(doc: str, path: str):
    """Evaluate a JSONPath-lite ($.a.b[0]) or simple-key path. → python value
    or None (parity: reference GetPath, json_functions/json_extract.cpp)."""
    try:
        v = json.loads(doc)
    except (ValueError, TypeError):
        return None
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
                parts.append(int(path[i + 1:j]))
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
            if isinstance(p, int):
                v = v[p]
            elif isinstance(v, dict):
                v = v[p]
            else:
                return None
        except (KeyError, IndexError, TypeError):
            return None
    return v


def register_json_functions():
    import jax.numpy as jnp

    from duckdb_tpu.blocks import Column
    from duckdb_tpu.planner.functions import (REGISTRY, dict_predicate,
                                              dict_transform)

    def _bind_json_extract_string(arg_exprs):
        path = str(arg_exprs[1].const_value())

        def impl(env, cols, node):
            def f(s):
                v = json_path_get(s, path)
                if v is None:
                    return ""
                return v if isinstance(v, str) else json.dumps(
                    v, separators=(",", ":"))
            out = dict_transform(cols[0], f)
            # NULL where the path is missing
            lut = np.fromiter((json_path_get(s, path) is not None
                               for s in cols[0].dict_values),
                              dtype=np.bool_, count=len(cols[0].dict_values))
            pv = jnp.asarray(lut)[jnp.clip(cols[0].data, 0, len(lut) - 1)]
            validity = (pv if out.validity is None
                        else jnp.logical_and(out.validity, pv))
            return Column(data=out.data, ltype=out.ltype, validity=validity,
                          dict_values=out.dict_values)
        return VARCHAR, impl, arg_exprs[:1]

    REGISTRY["json_extract_string"] = _bind_json_extract_string
    REGISTRY["json_extract_path_text"] = _bind_json_extract_string
    REGISTRY["json_extract"] = _bind_json_extract_string

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

    def _bind_json_array_length(arg_exprs):
        def impl(env, cols, node):
            def f(s):
                try:
                    v = json.loads(s)
                    return len(v) if isinstance(v, list) else 0
                except (ValueError, TypeError):
                    return 0
            lut = np.fromiter((f(s) for s in cols[0].dict_values),
                              dtype=np.int64,
                              count=len(cols[0].dict_values))
            d = jnp.asarray(lut)[jnp.clip(cols[0].data, 0, len(lut) - 1)]
            return Column(data=d, ltype=BIGINT, validity=cols[0].validity)
        return BIGINT, impl, arg_exprs

    REGISTRY["json_array_length"] = _bind_json_array_length

    def _bind_json_keys(arg_exprs):
        def impl(env, cols, node):
            def f(s):
                try:
                    v = json.loads(s)
                    return json.dumps(sorted(v)) if isinstance(v, dict) else "[]"
                except (ValueError, TypeError):
                    return "[]"
            return dict_transform(cols[0], f)
        return VARCHAR, impl, arg_exprs

    REGISTRY["json_keys"] = _bind_json_keys

    def _bind_json_type(arg_exprs):
        def impl(env, cols, node):
            def f(s):
                try:
                    v = json.loads(s)
                except (ValueError, TypeError):
                    return "INVALID"
                return {dict: "OBJECT", list: "ARRAY", str: "VARCHAR",
                        bool: "BOOLEAN", int: "BIGINT",
                        float: "DOUBLE"}.get(type(v), "NULL")
            return dict_transform(cols[0], f)
        return VARCHAR, impl, arg_exprs

    REGISTRY["json_type"] = _bind_json_type


register_json_functions()
