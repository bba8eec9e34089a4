"""Fused scan→filter→project→aggregate pipeline: ONE jitted XLA program.

This is the TPU answer to the reference's tightest loop — morsel-driven
scan feeding GroupedAggregateHashTable::AddChunk
(/root/reference/src/execution/aggregate_hashtable.cpp:371). Instead of a
per-chunk interpreter, the whole pipeline over the whole padded block is
traced once per (plan node, block size) and re-dispatched as a single
fused program: filters, expression arithmetic, dense group-id computation
and segment reductions all fuse; XLA tiles them across the VPU.

Eligibility (else the general path runs):
- the aggregate's subtree is Filter*/Project* over one Scan
- group keys are direct column refs with statically-known domains
  (dictionary length for VARCHAR, table min/max stats for integers/dates)
- aggregates in {sum, count, count_star, avg, min, max}, no DISTINCT
- dense domain product ≤ PERFECT_LIMIT (2^22 slots)

The jit cache key is (plan node identity, padded length): repeated
queries (the benchmark steady state, prepared statements) skip straight
to dispatch.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_tpu.blocks import Column, pad_bucket
from duckdb_tpu.ops.compact import compact_indices
from duckdb_tpu.planner import plan as P
from duckdb_tpu.planner import bound as B
from duckdb_tpu.types import BIGINT, DOUBLE, TypeId

PERFECT_LIMIT = 1 << 22

_FUSABLE_AGGS = {"sum", "count", "count_star", "avg", "mean", "min", "max"}


def try_fused_aggregate(executor, node: P.Aggregate):
    """Returns a Batch or None if the fused path doesn't apply."""
    from duckdb_tpu.execution.executor import Batch, DictCols, TableCols

    # 1. peel Filter/Project chain down to a Scan
    chain = []
    base = node.child
    while isinstance(base, (P.Filter, P.Project)):
        chain.append(base)
        base = base.child
    if not isinstance(base, P.Scan):
        return None
    chain.reverse()  # execution order: bottom-up

    for agg in node.aggs:
        if agg.func not in _FUSABLE_AGGS or agg.distinct:
            return None
        if len(agg.args) > 1:
            return None
        if agg.ltype.id is TypeId.VARCHAR:
            return None  # min/max over strings: dict plumbing → general path

    # 2. resolve project indirection for group keys: must be column refs
    project_items = {}
    for nd in chain:
        if isinstance(nd, P.Project):
            for k, e in nd.items:
                project_items[k] = e

    def resolve(e: B.BoundExpr) -> Optional[B.BoundExpr]:
        while isinstance(e, B.BoundColumnRef) and e.key in project_items:
            e = project_items[e.key]
        return e

    group_resolved = []
    for gkey, ge in node.groups:
        r = resolve(ge)
        if not isinstance(r, B.BoundColumnRef):
            return None
        group_resolved.append((gkey, r))

    # 3. base batch + needed column set
    base_batch = executor.execute(base)
    plen = base_batch.plen
    entry = executor.catalog.get_table(base.table)
    key2col = {key: col for col, key, _ in base.cols}

    needed: List[str] = []

    def collect(e: B.BoundExpr):
        for nn in B.walk(e):
            if isinstance(nn, B.BoundColumnRef) and nn.key in key2col:
                if nn.key not in needed:
                    needed.append(nn.key)

    for nd in chain:
        if isinstance(nd, P.Filter):
            collect(nd.expr)
        else:
            for _, e in nd.items:
                collect(e)
    for _, ge in group_resolved:
        collect(ge)
    for agg in node.aggs:
        for a in agg.args:
            collect(a)

    base_cols = {k: base_batch.src[k] for k in needed}

    # 4. static domains for each group key
    mins, domains = [], []
    for _, ref in group_resolved:
        c = base_cols.get(ref.key)
        if c is None:
            return None
        if c.ltype.id is TypeId.VARCHAR:
            mins.append(0)
            domains.append(len(c.dict_values) + 1)
        elif c.ltype.is_integer or c.ltype.id in (TypeId.DATE, TypeId.DECIMAL,
                                                  TypeId.BOOLEAN):
            st = entry.stats_for(key2col[ref.key])
            if st.min_val is None or st.max_val is None:
                return None
            lo, hi = int(st.min_val), int(st.max_val)
            if hi - lo + 2 > PERFECT_LIMIT:
                return None
            mins.append(lo)
            domains.append(hi - lo + 2)
        else:
            return None
    total = 1
    for d in domains:
        total *= d
        if total > PERFECT_LIMIT:
            return None

    # 5. build / fetch the jitted program
    from duckdb_tpu.execution.tracing import prefetch_scalar_subqueries

    all_exprs = [nd.expr for nd in chain if isinstance(nd, P.Filter)]
    for nd in chain:
        if isinstance(nd, P.Project):
            all_exprs += [e for _, e in nd.items]
    for agg in node.aggs:
        all_exprs += agg.args
    prefetch_scalar_subqueries(all_exprs)
    cache = node.__dict__.setdefault("_fused_cache", {})
    sig = (plen, tuple(needed))
    if sig not in cache:
        cache[sig] = _build_program(
            node, chain, group_resolved, base_cols, needed, mins, domains,
            total, plen,
        )
    fn = cache[sig]

    arrays = []
    for k in needed:
        c = base_cols[k]
        arrays.append(c.data)
        arrays.append(c.validity if c.validity is not None
                      else jnp.ones((0,), jnp.bool_))
    occ, slot_outputs = fn(base_batch.live, *arrays)

    # 6. compact occupied slots (host sync on group count only)
    n_groups = int(jnp.sum(occ > 0))
    out_plen = max(128, pad_bucket(max(1, n_groups)))
    slot_idx, _ = compact_indices(occ > 0, out_plen)
    slots64 = slot_idx.astype(jnp.int64)

    cols = {}
    # decode group key values from slot id (mixed radix)
    strides = []
    stride = 1
    for d in reversed(domains):
        strides.append(stride)
        stride *= d
    strides.reverse()
    for (gkey, ref), lo, dom, st in zip(group_resolved, mins, domains, strides):
        src_col = base_cols[ref.key]
        comp = (slots64 // jnp.int64(st)) % jnp.int64(dom)
        validity = comp > 0
        vals = (comp - 1 + jnp.int64(lo)).astype(src_col.data.dtype)
        out_live_mask = jnp.arange(out_plen) < n_groups
        validity = jnp.where(out_live_mask, validity, False)
        cols[gkey] = Column(data=vals, ltype=src_col.ltype, validity=validity,
                            dict_values=src_col.dict_values)
    for agg, (data, valid) in zip(node.aggs, slot_outputs):
        d = data[slot_idx]
        v = valid[slot_idx] if valid is not None else None
        cols[agg.key] = Column(data=d, ltype=agg.ltype, validity=v)

    out_live = jnp.arange(out_plen) < n_groups
    return Batch(src=DictCols(cols), plen=out_plen, live=out_live)


def _build_program(node, chain, group_resolved, base_cols, needed, mins,
                   domains, total, plen):
    """Trace the fused pipeline into one jitted program."""
    templates = {k: base_cols[k] for k in needed}
    filters = [nd.expr for nd in chain if isinstance(nd, P.Filter)]
    project_items = []
    for nd in chain:
        if isinstance(nd, P.Project):
            project_items.extend(nd.items)

    class _Env:
        """Eval env resolving base columns + project items lazily."""

        def __init__(self, cols, plen, live):
            self._cols = cols
            self.plen = plen
            self.live = live
            self._proj = dict(project_items)

        @property
        def cols(self):
            return self

        def __getitem__(self, key):
            if key in self._cols:
                return self._cols[key]
            if key in self._proj:
                c = self._proj[key].eval(self)
                self._cols[key] = c
                return c
            raise KeyError(key)

    def program(live, *arrays):
        cols = {}
        for i, k in enumerate(needed):
            data = arrays[2 * i]
            validity = arrays[2 * i + 1]
            t = templates[k]
            cols[k] = Column(
                data=data, ltype=t.ltype,
                validity=None if validity.shape[0] == 0 else validity,
                dict_values=t.dict_values,
            )
        env = _Env(cols, plen, live)
        for f in filters:
            c = f.eval(env)
            keep = jnp.broadcast_to(c.data.astype(jnp.bool_), (plen,))
            if c.validity is not None:
                keep = jnp.logical_and(keep, jnp.broadcast_to(c.validity, (plen,)))
            live = jnp.logical_and(live, keep)
            env.live = live

        # dense mixed-radix slot ids
        dense = jnp.zeros((plen,), jnp.int64)
        for (gkey, ref), lo, dom in zip(group_resolved, mins, domains):
            c = env[ref.key]
            kd = jnp.broadcast_to(c.data, (plen,)).astype(jnp.int64)
            if c.validity is not None:
                off = jnp.where(jnp.broadcast_to(c.validity, (plen,)),
                                jnp.clip(kd - lo + 1, 0, dom - 1), 0)
            else:
                off = jnp.clip(kd - lo + 1, 0, dom - 1)
            dense = dense * jnp.int64(dom) + off
        dense = jnp.where(live, dense, total).astype(jnp.int32)
        nseg = total + 1

        occ = jax.ops.segment_sum(live.astype(jnp.int32), dense,
                                  num_segments=nseg)[:-1]

        outputs = []
        for agg in node.aggs:
            outputs.append(_slot_agg(agg, env, dense, nseg, live, plen))
        return occ, outputs

    return jax.jit(program)


def _slot_agg(agg, env, dense, nseg, live, plen):
    """Per-slot aggregate values (+ validity or None), inside the trace."""
    if agg.func == "count_star":
        d = jax.ops.segment_sum(live.astype(jnp.int64), dense,
                                num_segments=nseg)[:-1]
        return (d, None)
    c = agg.args[0].eval(env)
    data = jnp.broadcast_to(c.data, (plen,))
    mask = live
    if c.validity is not None:
        mask = jnp.logical_and(mask, jnp.broadcast_to(c.validity, (plen,)))
    if agg.func == "count":
        d = jax.ops.segment_sum(mask.astype(jnp.int64), dense,
                                num_segments=nseg)[:-1]
        return (d, None)
    cnt = jax.ops.segment_sum(mask.astype(jnp.int64), dense,
                              num_segments=nseg)[:-1]
    nonempty = cnt > 0
    if agg.func == "sum":
        if c.ltype.is_float:
            x = jnp.where(mask, data.astype(jnp.float64), 0.0)
        else:
            x = jnp.where(mask, data.astype(jnp.int64), 0)
        d = jax.ops.segment_sum(x, dense, num_segments=nseg)[:-1]
        return (d, nonempty)
    if agg.func in ("avg", "mean"):
        if c.ltype.id is TypeId.DECIMAL:
            x = jnp.where(mask, data.astype(jnp.int64), 0)
            s = jax.ops.segment_sum(x, dense, num_segments=nseg)[:-1]
            divident = cnt.astype(jnp.float64) * jnp.float64(10.0 ** c.ltype.scale)
            return (s.astype(jnp.float64) / divident, nonempty)
        if c.ltype.is_float:
            x = jnp.where(mask, data.astype(jnp.float64), 0.0)
            s = jax.ops.segment_sum(x, dense, num_segments=nseg)[:-1]
            return (s / cnt.astype(jnp.float64), nonempty)
        x = jnp.where(mask, data.astype(jnp.int64), 0)
        s = jax.ops.segment_sum(x, dense, num_segments=nseg)[:-1]
        return (s.astype(jnp.float64) / cnt.astype(jnp.float64), nonempty)
    if agg.func in ("min", "max"):
        if c.ltype.is_float:
            sent = jnp.inf if agg.func == "min" else -jnp.inf
            x = jnp.where(mask, data.astype(jnp.float64), sent)
            op = jax.ops.segment_min if agg.func == "min" else jax.ops.segment_max
            d = op(x, dense, num_segments=nseg)[:-1].astype(c.data.dtype)
        else:
            sent = (np.iinfo(np.int64).max if agg.func == "min"
                    else np.iinfo(np.int64).min)
            x = jnp.where(mask, data.astype(jnp.int64), sent)
            op = jax.ops.segment_min if agg.func == "min" else jax.ops.segment_max
            d = op(x, dense, num_segments=nseg)[:-1].astype(c.data.dtype)
        return (d, nonempty)
    raise AssertionError(agg.func)
