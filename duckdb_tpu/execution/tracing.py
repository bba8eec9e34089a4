"""Per-node jit harness: evaluate bound expressions as ONE compiled program.

Every eager jnp op is a separate device dispatch — on a tunneled TPU each
costs a round trip. This module wraps a plan node's expression work into a
single cached jitted function of the child batch's column arrays: the
trace rebuilds Column views (metadata from templates captured at trace
time) and runs the normal eval machinery, so semantics are identical to
the eager path, just fused.

Cache key = (plan-node identity via its own dict, block length): repeated
queries on stable tables dispatch a pre-compiled program immediately.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp

_EMPTY_BOOL_CACHE = []


def _empty_bool():
    if not _EMPTY_BOOL_CACHE:
        _EMPTY_BOOL_CACHE.append(jnp.ones((0,), jnp.bool_))
    return _EMPTY_BOOL_CACHE[0]


_EMPTY_I64_CACHE = []


def _empty_i64():
    if not _EMPTY_I64_CACHE:
        _EMPTY_I64_CACHE.append(jnp.ones((0,), jnp.int64))
    return _EMPTY_I64_CACHE[0]


from duckdb_tpu.blocks import Column
from duckdb_tpu.planner import bound as B


def keys_of_exprs(exprs) -> List[str]:
    out = []
    for e in exprs:
        for n in B.walk(e):
            if isinstance(n, (B.BoundColumnRef, B.BoundAggregateRef)) \
                    and n.key not in out:
                out.append(n.key)
    return out


class TraceEnv:
    """EvalEnv-compatible env over traced column views.

    `overlay` maps keys to bound expressions evaluated lazily inside the
    trace (projection outputs referenced by ORDER BY, etc.).
    """

    def __init__(self, cols: Dict[str, Column], plen: int, live, overlay=None):
        self._cols = cols
        self.plen = plen
        self.live = live
        self._overlay = overlay or {}
        self.aux = {}  # named program inputs (join build state etc.)

    @property
    def cols(self):
        return self

    def __getitem__(self, key: str) -> Column:
        if key in self._cols:
            return self._cols[key]
        if key in self._overlay:
            c = self._overlay[key].eval(self)
            self._cols[key] = c
            return c
        raise KeyError(key)

    def __contains__(self, key):
        return key in self._cols or key in self._overlay


def prefetch_scalar_subqueries(exprs):
    """Execute uncorrelated scalar subqueries OUTSIDE any jit trace.

    Their values are cached on the node; evaluating them lazily inside a
    traced body would inline the inner query into the outer trace and turn
    its result into an abstract tracer."""
    for e in exprs:
        for n in B.walk(e):
            if type(n).__name__ == "BoundScalarSubquery":
                n.const_value()


def run_jitted(node, tag: str, batch, exprs: Sequence[B.BoundExpr],
               body: Callable, overlay: Dict[str, B.BoundExpr] = None,
               aux: Dict[str, "jnp.ndarray"] = None, variant=()):
    """Run `body(env) -> pytree of arrays` as one jitted program.

    `exprs` determines which child columns become program inputs (keys
    provided by `overlay` are computed inside the trace instead). `body`
    receives a TraceEnv and must be a pure function of it (it may call
    expr.eval(env)). Column metadata (ltype, dict) binds at trace time.

    `aux`: extra named device arrays passed as program INPUTS (env.aux) —
    join build LUTs, sorted key tables, build column planes. Inputs, not
    trace constants: capturing multi-MB arrays as constants blows up XLA
    compile time and kills compile-cache reuse (measured round 2, PERF.md).
    """
    overlay = overlay or {}
    aux = aux or {}
    prefetch_scalar_subqueries(exprs)
    prefetch_scalar_subqueries(overlay.values())
    keys = []
    pending = list(exprs)
    seen_overlay = set()
    while pending:
        e = pending.pop()
        for n in B.walk(e):
            if isinstance(n, (B.BoundColumnRef, B.BoundAggregateRef)):
                if n.key in overlay:
                    if n.key not in seen_overlay:
                        seen_overlay.add(n.key)
                        pending.append(overlay[n.key])
                elif n.key not in keys:
                    keys.append(n.key)
    keys.sort()
    cols = {}
    for k in keys:
        cols[k] = batch.src[k]
    cache = node.__dict__.get("_trace_cache")
    if cache is None:
        # registered for OOM eviction: compiled closures transitively pin
        # template columns, join-step build planes, and aux arrays
        from duckdb_tpu.execution.cache_registry import tracked_dict

        cache = node.__dict__["_trace_cache"] = tracked_dict()
    aux_names = tuple(sorted(aux))
    # `variant` captures body-shaping parameters that are CLOSURE constants
    # of the trace (learned compaction caps, group capacities): a re-run
    # with a grown cap must not reuse the stale compiled program
    sig = (tag, batch.plen, tuple(keys), variant,
           tuple((n, aux[n].shape, str(aux[n].dtype)) for n in aux_names))
    if sig not in cache:
        # metadata-only templates: capturing the input COLUMNS here would
        # pin their device planes for the life of the compiled program
        # (blocking pool eviction); the program needs only ltype + dict
        from types import SimpleNamespace

        templates = {k: SimpleNamespace(ltype=c.ltype,
                                        dict_values=c.dict_values)
                     for k, c in cols.items()}
        plen = batch.plen

        def program(live, aux_vals, *arrays):
            tcols = {}
            for i, k in enumerate(keys):
                t = templates[k]
                validity = arrays[3 * i + 1]
                data_hi = arrays[3 * i + 2]
                tcols[k] = Column(
                    data=arrays[3 * i], ltype=t.ltype,
                    validity=None if validity.shape[0] == 0 else validity,
                    dict_values=t.dict_values,
                    data_hi=None if data_hi.shape[0] == 0 else data_hi,
                )
            env = TraceEnv(tcols, plen, live, overlay)
            env.aux = dict(zip(aux_names, aux_vals))
            return body(env)

        cache[sig] = jax.jit(program)
    fn = cache[sig]
    arrays = []
    for k in keys:
        c = cols[k]
        arrays.append(c.data)
        arrays.append(c.validity if c.validity is not None
                      else _empty_bool())
        # wide (>int64) columns thread their high plane through as a real
        # input — dropping it silently truncated HUGEINT values to int64
        arrays.append(c.data_hi if c.data_hi is not None
                      else _empty_i64())
    return fn(batch.live, tuple(aux[n] for n in aux_names), *arrays)
