"""The engine's complete function-name universe.

Used by `duckdb_functions()` introspection and the registry-parity test
(tests/test_function_parity.py), which diffs this set against the
reference's registration lists (/root/reference/src/function/
function_list.cpp + extension/core_functions/function_list.cpp).
"""

from __future__ import annotations


# window functions are recognized only in OVER () context
# (planner._bind_window_call); aggregate sum/min/... names double as
# window names and are already counted via AGGREGATE_NAMES
WINDOW_NAMES = {
    "row_number", "rank", "dense_rank", "rank_dense", "ntile", "lag",
    "lead", "first_value", "last_value", "nth_value", "percent_rank",
    "cume_dist", "fill",
}

# lambda-taking functions bound structurally in binder._bind_FunctionCall
LAMBDA_NAMES = {
    "list_transform", "array_transform", "apply", "list_apply",
    "array_apply", "list_filter", "array_filter", "filter",
    "list_reduce", "array_reduce", "reduce",
}

# operator functions rewritten to operator ASTs
# (binder._op_function_rewrite + parser operator tokens)
OPERATOR_NAMES = {
    "+", "-", "*", "/", "//", "%", "**", "^", "||",
    "add", "subtract", "multiply", "divide", "mod",
    "=", "==", "!=", "<>", "<", "<=", ">", ">=",
    "&", "|", "<<", ">>", "~", "xor", "!__postfix", "@",
    "~~", "!~~", "~~*", "!~~*", "~~~", "^@",
    "<@", "@>", "&&", "<->", "<=>",
    "IS DISTINCT FROM", "IS NOT DISTINCT FROM", "__between",
}

# bound structurally (named-argument / constant-folded forms)
STRUCTURAL_NAMES = {
    "struct_insert", "struct_update",
    "to_months", "to_quarters", "to_years", "to_decades", "to_centuries",
    "to_millennia",
}


def all_function_names() -> set:
    """Every SQL-callable function name the engine recognizes."""
    from duckdb_tpu.planner import binder as _b  # triggers registrations
    from duckdb_tpu.planner.functions import REGISTRY

    names = set(REGISTRY)
    names |= set(_b.AGGREGATE_NAMES)
    names |= WINDOW_NAMES
    names |= LAMBDA_NAMES
    names |= OPERATOR_NAMES
    names |= STRUCTURAL_NAMES
    return names
