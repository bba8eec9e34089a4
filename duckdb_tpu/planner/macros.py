"""SQL macros: parameterized expression / table templates.

DuckDB binds a macro by substituting the caller's argument *parse trees*
for parameter references inside the stored body and re-binding the result
(reference: src/function/scalar_macro_function.cpp MacroFunction::Bind,
src/catalog/catalog_entry/macro_catalog_entry.cpp). We do the same over
the untyped AST: `expand_call` deep-substitutes argument expressions for
single-part ColumnRefs naming a parameter, then the normal binder runs on
the expanded tree — so macros compose with aggregates, windows, lambdas,
subqueries and other macros for free.

Known divergence: a lambda parameter with the same name as a macro
parameter does not shadow it (the reference resolves lambda params
first); avoid the collision.
"""

import contextlib
import copy
import dataclasses

from duckdb_tpu.sql import nodes as N


class MacroError(Exception):
    pass


@dataclasses.dataclass
class MacroDef:
    name: str
    params: tuple          # positional parameter names (lowered)
    defaults: dict         # name -> Expr AST (used when not supplied)
    body: object           # Expr AST (scalar) or SelectStatement (table)
    is_table: bool
    sql_text: str = ""     # original CREATE MACRO text (persistence)


# Rebound by Connection.sql() to the active catalog's macro registry so
# ExprBinder (which has no catalog handle) can resolve macro calls — the
# same pattern as functions_ext.ACTIVE_SEQUENCES.
ACTIVE_MACROS: dict = {}

_MAX_DEPTH = 64
_depth = 0


def substitute(node, mapping):
    """Deep-copy `node` with single-part ColumnRefs replaced per `mapping`."""
    if isinstance(node, N.ColumnRef):
        rep = mapping.get(node.parts[0].lower())
        if rep is not None:
            out = copy.deepcopy(rep)
            # param.field.sub → struct_extract chain (the reference binds
            # dotted access on macro params the same way)
            for fieldname in node.parts[1:]:
                out = N.FunctionCall("struct_extract",
                                     [out, N.Literal(fieldname)])
            return out
        return node
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        kw = {}
        changed = False
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            nv = substitute(v, mapping)
            kw[f.name] = nv
            changed = changed or nv is not v
        if not changed:
            return node
        out = dataclasses.replace(node, **kw)
        if hasattr(node, "_sql_text"):
            out._sql_text = node._sql_text
        return out
    if isinstance(node, list):
        return [substitute(v, mapping) for v in node]
    if isinstance(node, tuple):
        return tuple(substitute(v, mapping) for v in node)
    if isinstance(node, dict):
        return {k: substitute(v, mapping) for k, v in node.items()}
    return node


def _find_column_refs(node) -> list:
    if isinstance(node, N.ColumnRef):
        return [node]
    out = []
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        for f in dataclasses.fields(node):
            out += _find_column_refs(getattr(node, f.name))
    elif isinstance(node, (list, tuple)):
        for x in node:
            out += _find_column_refs(x)
    return out


def split_args(args):
    """Separate positional from `name := expr` named arguments."""
    pos, named = [], {}
    for a in args:
        if (isinstance(a, N.BinaryOp) and a.op == ":="
                and isinstance(a.left, N.ColumnRef) and len(a.left.parts) == 1):
            named[a.left.parts[0].lower()] = a.right
        else:
            pos.append(a)
    return pos, named


def expand_call(mac: MacroDef, args, named=None):
    """Return the macro body with arguments substituted for parameters."""
    global _depth
    named = dict(named or {})
    required = [p for p in mac.params if p not in mac.defaults]
    if len(args) > len(mac.params):
        raise MacroError(
            f"Macro function {mac.name!r} requires {len(required)} "
            f"positional arguments, but {len(args)} were provided")
    mapping = {}
    for p, a in zip(mac.params, args):
        mapping[p] = a
    for p in mac.params[len(args):]:
        if p in named:
            mapping[p] = named.pop(p)
        elif p in mac.defaults:
            mapping[p] = mac.defaults[p]
        else:
            raise MacroError(
                f"Macro function {mac.name!r}: missing argument {p!r}")
    if named:
        raise MacroError(
            f"Binder Error: Macro function {mac.name!r}: unknown named "
            f"argument {next(iter(named))!r}")
    return substitute(mac.body, mapping)


def expand_macros(node, depth: int = 0):
    """Replace every scalar-macro FunctionCall in an AST (whole statements
    included) with its expanded body, bottom-up, so downstream passes —
    aggregate detection in particular, which scans the raw AST for
    aggregate names before binding — see only concrete functions."""
    if depth > _MAX_DEPTH:
        raise MacroError(
            "Max expression depth limit of 1000 exceeded "
            "(recursive macro?)")
    if isinstance(node, N.FunctionCall):
        mac = ACTIVE_MACROS.get(node.name.lower())
        if mac is not None and not mac.is_table:
            pos, named = split_args(
                [expand_macros(a, depth) for a in node.args])
            return expand_macros(expand_call(mac, pos, named), depth + 1)
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        kw = {}
        changed = False
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            nv = expand_macros(v, depth)
            kw[f.name] = nv
            changed = changed or nv is not v
        if not changed:
            return node
        out = dataclasses.replace(node, **kw)
        if hasattr(node, "_sql_text"):
            out._sql_text = node._sql_text
        return out
    if isinstance(node, list):
        return [expand_macros(v, depth) for v in node]
    if isinstance(node, tuple):
        return tuple(expand_macros(v, depth) for v in node)
    if isinstance(node, dict):
        return {k: expand_macros(v, depth) for k, v in node.items()}
    return node


# Built-in default macros, mirroring the reference's internal_macros table
# (reference: src/catalog/default/default_functions.cpp:12). Only entries
# whose base functions exist in this engine are carried; bodies are kept
# verbatim where possible.
_DEFAULT_MACRO_SQL = [
    "CREATE MACRO current_role() AS 'duckdb'",
    "CREATE MACRO current_user() AS 'duckdb'",
    "CREATE MACRO user() AS current_user()",
    "CREATE MACRO session_user() AS 'duckdb'",
    "CREATE MACRO current_catalog() AS current_database()",
    "CREATE MACRO round_even(x, n) AS CASE ((abs(x) * power(10, n+1)) % 10)"
    " WHEN 5 THEN round(x/2, n) * 2 ELSE round(x, n) END",
    "CREATE MACRO roundbankers(x, n) AS round_even(x, n)",
    "CREATE MACRO list_append(l, e) AS list_concat(l, list_value(e))",
    "CREATE MACRO array_append(arr, el) AS list_append(arr, el)",
    "CREATE MACRO list_prepend(e, l) AS list_concat(list_value(e), l)",
    "CREATE MACRO array_prepend(el, arr) AS list_prepend(el, arr)",
    "CREATE MACRO array_push_back(arr, e) AS "
    "list_concat(arr, list_value(e))",
    "CREATE MACRO array_push_front(arr, e) AS "
    "list_concat(list_value(e), arr)",
    "CREATE MACRO fdiv(x, y) AS floor(x/y)",
    "CREATE MACRO fmod(x, y) AS (x-y*floor(x/y))",
    "CREATE MACRO geomean(x) AS exp(avg(ln(x)))",
    "CREATE MACRO geometric_mean(x) AS geomean(x)",
    "CREATE MACRO weighted_avg(value, weight) AS SUM(value * weight) / "
    "SUM(CASE WHEN value IS NOT NULL THEN weight ELSE 0 END)",
    "CREATE MACRO wavg(value, weight) AS weighted_avg(value, weight)",
    "CREATE MACRO array_to_string(arr, sep) AS "
    "list_aggr(arr, 'string_agg', sep)",
    "CREATE MACRO array_to_string_comma_default(arr, sep := ',') AS "
    "list_aggr(arr, 'string_agg', sep)",
    "CREATE MACRO array_reverse(l) AS list_reverse(l)",
    "CREATE MACRO map_contains_value(map, value) AS "
    "contains(map_values(map), value)",
    "CREATE MACRO date_add(date, i) AS date + i",
    "CREATE MACRO days_in_month(date) AS day(last_day(date))",
    "CREATE MACRO ago(i) AS current_timestamp - i",
    # json aggregate shims (reference implements these as native
    # aggregates, extension/json/json_functions/json_create.cpp)
    "CREATE MACRO json_group_array(x) AS to_json(list(x))",
] + [
    f"CREATE MACRO list_{a}(l) AS list_aggr(l, '{a}')"
    for a in ("avg", "var_samp", "var_pop", "stddev_pop", "stddev_samp",
              "sem", "approx_count_distinct", "bit_xor", "bit_or", "bit_and",
              "bool_and", "bool_or", "count", "entropy", "last", "first",
              "any_value", "kurtosis", "kurtosis_pop", "min", "max",
              "product", "skewness", "sum", "string_agg", "mode", "median",
              "mad")
]

_DEFAULT_MACROS_CACHE = None


def default_macros() -> dict:
    """Parsed MacroDefs for the built-in macro table (parsed once)."""
    global _DEFAULT_MACROS_CACHE
    if _DEFAULT_MACROS_CACHE is None:
        from duckdb_tpu.planner.binder import AGGREGATE_NAMES
        from duckdb_tpu.planner.functions import REGISTRY
        from duckdb_tpu.sql import nodes as _N
        from duckdb_tpu.sql.parser import Parser

        out = {}
        for sql in _DEFAULT_MACRO_SQL:
            st = Parser(sql).parse_statements()[0]
            assert isinstance(st, _N.CreateMacro), sql
            if st.name.lower() in REGISTRY or st.name.lower() in \
                    AGGREGATE_NAMES:
                continue  # a native implementation wins over the macro
            out[st.name.lower()] = MacroDef(
                st.name.lower(), tuple(p.lower() for p in st.params),
                dict(st.defaults), st.body, st.is_table, sql_text="")
        _DEFAULT_MACROS_CACHE = out
    return dict(_DEFAULT_MACROS_CACHE)


@contextlib.contextmanager
def expansion_guard(name: str):
    """Guard the *binding* of an expanded macro body, so self-referential
    macros fail with a clear error instead of blowing the Python stack."""
    global _depth
    if _depth >= _MAX_DEPTH:
        raise MacroError(
            "Max expression depth limit of 1000 exceeded binding macro "
            f"{name!r} (recursive macro?)")
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
