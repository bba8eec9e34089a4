"""Out-of-core execution: partition-loop over row chunks of the largest scan.

When a query's scan working set exceeds the device memory budget
(`SET memory_limit`), the engine cannot materialize every column on the
chip at once. The reference spills operator state to temp files
(/root/reference/src/execution/operator/join/physical_hash_join.cpp:345,
ProbeSpill; /root/reference/src/storage/temporary_memory_manager.cpp:28
arbitration). The TPU-native equivalent implemented here keeps HOST DRAM
as the spill tier and processes the fact table in row chunks:

    for each chunk of the largest scanned table:
        run the plan with that scan restricted to the chunk
        append the (small) partial result to a host-side temp table
    re-run the query tail over the temp table with MERGE aggregates

Chunk-decomposable roots: Limit?(Order?(Project(Filter?(Aggregate(X)))))
where every aggregate has a distributive merge (sum/count/min/max/avg/
bool_and/bool_or/product/first/last/any_value), plus aggregate-free tails
(pure select: chunk outputs concatenate). The chunked scan must reach the
root aggregate through streaming edges only: Filter, Project, and the
PROBE side of joins (probe-chunking a join is exact: each probe row joins
in exactly one chunk; build sides re-execute per chunk and hit the
per-table join-build cache).

This composes with the rest of the engine unchanged — the chunk runs are
ordinary executor runs over a sliced TableEntry view, so fusion tiers,
join kernels and the aggregate paths all apply per chunk.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Dict, List, Optional, Tuple

import numpy as np

from duckdb_tpu.catalog.catalog import POOL, ColumnDef, TableEntry
from duckdb_tpu.planner import bound as B
from duckdb_tpu.planner import plan as P
from duckdb_tpu.types import BIGINT, DOUBLE, LogicalType, TypeId

# host-DRAM working-set multiple of raw scan bytes (live masks, gathered
# intermediates, sort payloads)
WORKING_SET_FACTOR = 2.5

# aggregate func → merge func over chunk partials (None = decompose avg)
MERGEABLE = {
    "sum": "sum", "count": "sum", "count_star": "sum",
    "min": "min", "max": "max", "bool_and": "bool_and",
    "bool_or": "bool_or", "product": "product",
    "first": "first", "any_value": "first", "last": "last",
    "fsum": "fsum",
}


def _col_bytes(t: LogicalType, nrows: int) -> int:
    if t.id is TypeId.VARCHAR:
        return 4 * nrows
    if t.id is TypeId.BOOLEAN:
        return nrows
    return 8 * nrows


def _plan_children(node: P.PlanNode) -> List[Tuple[str, P.PlanNode]]:
    out = []
    for name in ("child", "probe", "build", "left", "right"):
        c = getattr(node, name, None)
        if isinstance(c, P.PlanNode):
            out.append((name, c))
    return out


def _used_keys(plan: P.PlanNode) -> set:
    """Every column key referenced by any expression in the plan."""
    used: set = set()
    stack = [plan]
    while stack:
        n = stack.pop()
        exprs = []
        for attr in ("expr", "extra"):
            e = getattr(n, attr, None)
            if e is not None:
                exprs.append(e)
        for attr in ("items", "groups"):
            for it in getattr(n, attr, ()) or ():
                exprs.extend(x for x in (it if isinstance(it, tuple) else
                                         (it,))
                             if isinstance(x, B.BoundExpr))
        for e in (getattr(n, "probe_keys", ()) or ()):
            exprs.append(e)
        for e in (getattr(n, "build_keys", ()) or ()):
            exprs.append(e)
        for agg in getattr(n, "aggs", ()) or ():
            exprs.extend(agg.args)
            exprs.extend(getattr(agg, "order_by_exprs", ()) or ())
        for e in exprs:
            for nn in B.walk(e):
                if isinstance(nn, (B.BoundColumnRef, B.BoundAggregateRef)):
                    used.add(nn.key)
        for _, c in _plan_children(n):
            stack.append(c)
    return used


def _scan_stats(plan: P.PlanNode, catalog) -> Dict[str, int]:
    """table name → scan bytes of the columns the plan actually READS
    (0 if the table is scanned more than once or missing — such tables
    are not chunkable). Counting every declared scan column instead
    over-estimated 16-column TPC-H scans ~2.5x and pushed SF10 queries
    into the partition loop when they fit on-chip."""
    used = _used_keys(plan)
    seen: Dict[str, int] = {}
    stack = [plan]
    while stack:
        n = stack.pop()
        if isinstance(n, P.Scan):
            try:
                entry = catalog.get_table(n.table)
            except Exception:  # noqa: BLE001
                seen[n.table] = 0
                continue
            cols = [(c, k, t) for c, k, t in n.cols
                    if not used or k in used]
            b = sum(_col_bytes(t, entry.nrows) for _, _, t in cols)
            seen[n.table] = 0 if n.table in seen else b
        for _, c in _plan_children(n):
            stack.append(c)
    return seen


def _route_streams_to_root(plan: P.PlanNode, inner: P.PlanNode,
                           table: str) -> bool:
    """True if the only Scan of `table` reaches `inner`'s subtree through
    Filter/Project/probe edges (no Window/Aggregate/build-side/etc.)."""

    def contains(n) -> bool:
        if isinstance(n, P.Scan) and n.table == table:
            return True
        return any(contains(c) for _, c in _plan_children(n))

    def ok(n) -> bool:
        if isinstance(n, P.Scan):
            return n.table == table
        kids = [(e, c) for e, c in _plan_children(n) if contains(c)]
        if len(kids) != 1:
            return False
        edge, child = kids[0]
        if isinstance(n, (P.Filter, P.Project)):
            pass
        elif isinstance(n, (P.Join, P.CrossJoin)) and edge == "probe":
            pass
        else:
            return False
        return ok(child)

    return contains(inner) and ok(inner)


def _chunk_entry(entry: TableEntry, cols: List[str], lo: int,
                 hi: int) -> TableEntry:
    """Row-slice view of a table: host planes sliced lazily, stats
    recomputed per chunk (they are the chunk's zone maps)."""
    ce = TableEntry(entry.name, [ColumnDef(c.name, c.ltype)
                                 for c in entry.columns])
    ce.nrows = hi - lo

    def loader(col):
        values, validity, dvals = entry.host_column(col)
        return (values[lo:hi],
                validity[lo:hi] if validity is not None else None,
                dvals)

    for c in entry.columns:
        ce.set_lazy_column(c.name, (lambda col=c.name: loader(col)))
    return ce


def _decompose_aggs(aggs: List[B.BoundAggregate]):
    """→ (partial_aggs, merge_aggs, finalize_overlay) or None.

    partial_aggs run per chunk; merge_aggs run over the concatenated
    partials (arg = column ref to the partial's output key); the overlay
    recomputes composite results (avg) from merged parts under the
    ORIGINAL output keys so the query tail runs unchanged."""
    from duckdb_tpu.planner.planner import _agg_result_type

    partial: List[B.BoundAggregate] = []
    merge: List[B.BoundAggregate] = []
    overlay: Dict[str, B.BoundExpr] = {}
    for a in aggs:
        wide_int_sum = (a.func == "sum" and a.ltype.id is TypeId.HUGEINT
                        and a.args and a.args[0].ltype.is_integer)
        if a.distinct or a.order_by or (a.ltype.id is TypeId.HUGEINT
                                        and not wide_int_sum):
            return None
        if wide_int_sum:
            # integer sum promoted to HUGEINT: per-chunk partials are
            # narrow int64 (exact unless one chunk alone exceeds 2^63);
            # the merge re-sums through the wide hi/lo planes, so the
            # combined result is exact beyond int64
            partial.append(B.BoundAggregate("sum", a.args, False, BIGINT,
                                            a.key))
            merge.append(B.BoundAggregate(
                "sum", [B.BoundColumnRef(a.key, BIGINT)], False, a.ltype,
                a.key))
            continue
        if a.func == "avg":
            arg_t = a.args[0].ltype
            s_t = _agg_result_type("sum", a.args)
            if s_t.id is TypeId.HUGEINT:
                s_t = arg_t if arg_t.id is TypeId.DECIMAL else DOUBLE
            ks, kc = a.key + "#s", a.key + "#c"
            partial.append(B.BoundAggregate("sum", a.args, False, s_t, ks))
            partial.append(B.BoundAggregate(
                "count", list(a.args), False, BIGINT, kc))
            merge.append(B.BoundAggregate(
                "sum", [B.BoundColumnRef(ks, s_t)], False, s_t, ks))
            merge.append(B.BoundAggregate(
                "sum", [B.BoundColumnRef(kc, BIGINT)], False, BIGINT, kc))
            overlay[a.key] = _avg_finalize(ks, kc, s_t, a.ltype)
        elif a.func in MERGEABLE:
            p_t = a.ltype
            partial.append(B.BoundAggregate(a.func, a.args, False, p_t,
                                            a.key))
            merge.append(B.BoundAggregate(
                MERGEABLE[a.func], [B.BoundColumnRef(a.key, p_t)], False,
                a.ltype, a.key))
        else:
            return None
    return partial, merge, overlay


def _avg_finalize(ks: str, kc: str, s_t: LogicalType,
                  out_t: LogicalType) -> B.BoundExpr:
    """avg from merged (sum, count): reproduces the engine's exact DECIMAL
    semantics — double(int_sum) / (double(count) · 10^scale)."""
    import jax.numpy as jnp

    from duckdb_tpu.blocks import Column

    scale = 10 ** s_t.scale if s_t.id is TypeId.DECIMAL else 1

    def impl(env, cols, node):
        s, c = cols
        sd = jnp.broadcast_to(s.data, (env.plen,)).astype(jnp.float64)
        cd = jnp.broadcast_to(c.data, (env.plen,)).astype(jnp.float64)
        d = sd / (cd * float(scale))
        valid = cd > 0
        if s.validity is not None:
            valid = jnp.logical_and(valid,
                                    jnp.broadcast_to(s.validity,
                                                     (env.plen,)))
        return Column(data=d, ltype=out_t, validity=valid)

    return B.BoundFunction("__avg_merge", [
        B.BoundColumnRef(ks, s_t), B.BoundColumnRef(kc, BIGINT)], out_t,
        impl)


def _concat_results(results, types: List[LogicalType]):
    """Column-wise concat of chunk Results, re-encoding VARCHAR dicts."""
    cols = []
    for i, t in enumerate(types):
        datas, valids, dicts = [], [], []
        for r in results:
            d, v, dv = r.columns[i]
            datas.append(np.asarray(d))
            valids.append(v if v is not None
                          else np.ones(r.nrows, dtype=bool))
            dicts.append(dv)
        if t.id is TypeId.VARCHAR:
            # per-chunk dict codes are not comparable: decode + re-encode
            strs = np.concatenate([
                (dv[np.clip(d.astype(np.int64), 0, max(len(dv) - 1, 0))]
                 if dv is not None and len(dv) else
                 np.full(len(d), "", dtype=object))
                for d, dv in zip(datas, dicts)])
            uniq, codes = np.unique(strs.astype(str), return_inverse=True)
            cols.append((codes.astype(np.int32), np.concatenate(valids),
                         uniq.astype(object)))
        else:
            cols.append((np.concatenate(datas), np.concatenate(valids),
                         None))
    return cols


_TMP_NAME = "__ooc_partials"


def try_chunked(executor, plan: P.PlanNode, output):
    """Out-of-core driver. Returns a Result, or None when the plan fits in
    memory / is not chunk-decomposable (caller runs the normal path)."""
    budget = POOL.limit
    if budget <= 0 or getattr(executor, "_in_chunked", False):
        return None
    catalog = executor.catalog
    scans = _scan_stats(plan, catalog)
    total = sum(scans.values())
    if total * WORKING_SET_FACTOR <= budget:
        return None

    # unwrap the tail: Limit?(Order?(Project(Filter?(Aggregate?(X)))))
    node = plan
    limit_node = order_node = filter_node = agg_node = None
    if isinstance(node, P.Limit):
        limit_node, node = node, node.child
    if isinstance(node, P.Order):
        order_node, node = node, node.child
    if not isinstance(node, P.Project):
        executor._log("DEBUG", "out_of_core",
                      f"tail root {type(node).__name__} not chunkable; "
                      "running in-memory")
        return None
    proj, node = node, node.child
    if isinstance(node, P.Filter):
        filter_node, node = node, node.child
    if isinstance(node, P.Aggregate):
        agg_node, node = node, node.child
    elif filter_node is not None:
        node = filter_node
        filter_node = None
    inner = node if agg_node is None else agg_node
    # the chunked scan must stream through Filter/Project/probe edges from
    # BELOW the root aggregate (the aggregate itself is merge-decomposed)
    stream_root = agg_node.child if agg_node is not None else inner

    # pick the chunked table: the largest single-scan table that streams
    # into the root
    best, best_bytes = None, 0
    for t, b in scans.items():
        if b > best_bytes and _route_streams_to_root(plan, stream_root, t):
            best, best_bytes = t, b
    if best is None or best_bytes == 0:
        executor._log("DEBUG", "out_of_core",
                      "no scan streams to the root through "
                      "filter/project/probe edges; running in-memory")
        return None
    other = total - best_bytes
    usable = budget / WORKING_SET_FACTOR - other
    usable = max(usable, budget / WORKING_SET_FACTOR * 0.25)
    k = max(2, math.ceil(best_bytes / usable))
    entry = catalog.get_table(best)
    rows_per = math.ceil(entry.nrows / k)
    executor._log("INFO", "out_of_core",
                  f"scan working set ~{total * WORKING_SET_FACTOR / 1e6:.0f}MB"
                  f" exceeds memory_limit ({budget / 1e6:.0f}MB): "
                  f"processing {best} in {k} chunks of {rows_per} rows")

    if agg_node is not None:
        dec = _decompose_aggs(agg_node.aggs)
        if dec is None:
            executor._log("WARN", "out_of_core",
                          "root aggregate not merge-decomposable; running "
                          "in-memory (may exceed memory_limit)")
            return None
        partial_aggs, merge_aggs, overlay = dec
        chunk_plan = P.Aggregate(child=agg_node.child,
                                 groups=agg_node.groups, aggs=partial_aggs)
        chunk_out = ([(k_, k_, e.ltype) for k_, e in agg_node.groups]
                     + [(a.key, a.key, a.ltype) for a in partial_aggs])
    else:
        # pure select: run the projection inside each chunk; chunk outputs
        # are the projection's outputs plus any extra source columns ORDER BY
        # references that the projection does not emit (passed through under
        # fresh keys — an identity item under the same key would self-recurse
        # in the projection overlay)
        chunk_items = list(proj.items)
        proj_keys = {k_ for k_, _ in chunk_items}
        order_items = list(order_node.items) if order_node is not None else []
        for i, (e, desc, nf) in enumerate(order_items):
            refs = [nn for nn in B.walk(e)
                    if isinstance(nn, (B.BoundColumnRef, B.BoundAggregateRef))]
            if all(nn.key in proj_keys for nn in refs):
                continue
            if not isinstance(e, (B.BoundColumnRef, B.BoundAggregateRef)):
                return None  # complex sort expr over unprojected columns
            pt = e.key + "#pt"
            if pt not in proj_keys:
                proj_keys.add(pt)
                chunk_items.append((pt, e))
            order_items[i] = (B.BoundColumnRef(pt, e.ltype), desc, nf)
        chunk_plan = replace(proj, items=chunk_items, child=inner)
        chunk_out = [(k_, k_, e.ltype) for k_, e in chunk_items]
        if any(t.id in (TypeId.LIST, TypeId.STRUCT, TypeId.MAP,
                        TypeId.HUGEINT) for _, _, t in chunk_out):
            return None

    # ---- chunk loop ----
    from duckdb_tpu.execution.executor import Executor
    from duckdb_tpu.storage.spill import SpillDir, SpillWriter

    types = [t for _, _, t in chunk_out]
    # aggregate partials are bounded by (groups × k) and stay in RAM;
    # pure-select partials scale with the scan, so they STREAM to the
    # disk spill tier (host RAM holds one chunk's output at a time —
    # the temporary_file_manager.cpp analog)
    spill = writer = None
    if agg_node is None:
        spill = SpillDir(catalog, "ooc")
        writer = SpillWriter(spill, types)
    results = []
    for ci in range(k):
        lo, hi = ci * rows_per, min((ci + 1) * rows_per, entry.nrows)
        if lo >= hi:
            break
        ce = _chunk_entry(entry, [c.name for c in entry.columns], lo, hi)
        ex = Executor(catalog)
        ex._in_chunked = True
        ex._scan_overrides = {best: ce}
        r = ex.run(chunk_plan, chunk_out)
        if writer is not None:
            writer.append(r.columns, r.nrows)
        else:
            results.append(r)

    # ---- merge ----
    tmp = TableEntry(_TMP_NAME, [ColumnDef(key, t)
                                 for _, key, t in chunk_out])
    if writer is not None:
        merged_cols = writer.finish()
        tmp.nrows = writer.nrows
        for (name, key, t), (d, v, dv) in zip(chunk_out, merged_cols):
            tmp.set_host_column(key, d, v, dv)
    else:
        merged_cols = _concat_results(results, types)
        tmp.nrows = sum(r.nrows for r in results)
        for (name, key, t), (d, v, dv) in zip(chunk_out, merged_cols):
            if d.dtype == object:
                # wide DECIMAL/HUGEINT sum partials finalize to Python
                # ints; the merge re-runs the engine's wide device sum, so
                # int64 partials stay exact end-to-end
                try:
                    d = d.astype(np.int64)
                except OverflowError:
                    from duckdb_tpu.errors import OutOfRangeException
                    raise OutOfRangeException(
                        "out-of-core aggregate partial exceeds the 64-bit "
                        "range; raise memory_limit for this query")
            tmp.set_host_column(key, d, None if v.all() else v, dv)

    # ---- out-of-core ORDER BY: the merged temp table itself may exceed
    # the device budget; range-partition on the leading sort key and sort
    # each partition on-device (the external-merge-sort analog of
    # src/common/sort/ — partitions ride the spill tier, the TPU does all
    # comparisons) ----
    if (agg_node is None and order_node is not None
            and sum(_col_bytes(t, tmp.nrows) for t in types)
            * WORKING_SET_FACTOR > budget):
        try:
            return _range_partitioned_order(
                executor, catalog, tmp, chunk_out, order_items,
                limit_node, output, budget)
        finally:
            if spill is not None:
                spill.delete()

    if agg_node is not None:
        scan = P.Scan(table=_TMP_NAME, alias=_TMP_NAME,
                      cols=[(key, key, t) for _, key, t in chunk_out])
        groups = [(k_, B.BoundColumnRef(k_, e.ltype))
                  for k_, e in agg_node.groups]
        merged: P.PlanNode = P.Aggregate(child=scan, groups=groups,
                                         aggs=merge_aggs)
        if overlay:
            items = ([(k_, B.BoundColumnRef(k_, e.ltype))
                      for k_, e in agg_node.groups]
                     + [(a.key, B.BoundAggregateRef(a.key, a.ltype))
                        for a in merge_aggs if a.key not in
                        {x for x in overlay}]
                     + list(overlay.items()))
            merged = P.Project(child=merged, items=items)
        if filter_node is not None:
            merged = P.Filter(child=merged, expr=filter_node.expr)
        merged = replace(proj, child=merged)
    else:
        # chunks already ran the projection: pass outputs straight through
        # (scan keys get a prefix — a same-key identity projection item
        # would self-recurse in the projection overlay env)
        scan = P.Scan(table=_TMP_NAME, alias=_TMP_NAME,
                      cols=[(key, "__ooc." + key, t)
                            for _, key, t in chunk_out])
        merged = P.Project(child=scan,
                           items=[(key, B.BoundColumnRef("__ooc." + key, t))
                                  for _, key, t in chunk_out])
    if order_node is not None:
        merged = (replace(order_node, child=merged) if agg_node is not None
                  else replace(order_node, child=merged, items=order_items))
    if limit_node is not None:
        merged = replace(limit_node, child=merged)

    ex = Executor(catalog)
    ex._in_chunked = True
    ex._scan_overrides = {_TMP_NAME: tmp}
    try:
        return ex.run(merged, output)
    finally:
        if spill is not None:
            spill.delete()


def _range_partitioned_order(executor, catalog, tmp, chunk_out, order_items,
                             limit_node, output, budget):
    """ORDER BY over a temp table bigger than the device budget.

    Range-partition rows on the LEADING sort key (boundaries from a host
    sample; rows with equal keys land in one partition, so multi-key ties
    are resolved by the per-partition device sort), sort each partition
    on-device, and stream partition outputs through the spill tier in
    partition order. The TPU analog of the reference's external merge
    sort (src/common/sort/sorted_block.cpp): no host-side merging — the
    device sorts every row, the host only routes partitions.
    """
    import math as _math

    from duckdb_tpu.execution.executor import Executor
    from duckdb_tpu.storage.spill import SpillDir, SpillWriter

    types = [t for _, _, t in chunk_out]
    n = tmp.nrows
    e0, desc0, nf0 = order_items[0]
    nf0 = bool(nf0) if nf0 is not None else False  # duckdb: NULLS LAST
    vals, valid, dv = tmp.host_column(e0.key)
    vals = np.asarray(vals)

    bytes_all = sum(_col_bytes(t, n) for t in types)
    nparts = max(2, _math.ceil(bytes_all * WORKING_SET_FACTOR
                               / max(budget * 0.5, 1)))
    nonnull = np.arange(n) if valid is None else np.nonzero(
        np.asarray(valid))[0]
    null_idx = (np.zeros(0, np.int64) if valid is None
                else np.nonzero(~np.asarray(valid))[0])
    sample = vals[nonnull[:: max(1, len(nonnull) // 65536)]] \
        if len(nonnull) else vals[:0]
    # boundaries at even sample quantiles; VARCHAR leading keys work
    # because the spill writer re-sorts dictionaries (codes = lex order)
    edges = np.unique(np.sort(sample)[
        np.linspace(0, max(len(sample) - 1, 0), nparts - 1).astype(np.int64)
    ]) if len(sample) else np.zeros(0, vals.dtype)
    pid = np.searchsorted(edges, vals, side="right")

    executor._log("INFO", "out_of_core",
                  f"ORDER BY over {bytes_all / 1e6:.0f}MB temp exceeds the "
                  f"device budget: {len(edges) + 1} range partitions")

    cap = None
    if limit_node is not None and limit_node.n is not None:
        cap = limit_node.n + (limit_node.offset or 0)

    scan = P.Scan(table=_TMP_NAME, alias=_TMP_NAME,
                  cols=[(key, "__ooc." + key, t) for _, key, t in chunk_out])
    part_plan = P.Order(
        child=P.Project(child=scan,
                        items=[(key, B.BoundColumnRef("__ooc." + key, t))
                               for _, key, t in chunk_out]),
        items=order_items)

    order = list(range(len(edges) + 1))
    if desc0:
        order.reverse()
    blocks = [("null", None)] if (nf0 and len(null_idx)) else []
    blocks += [("part", p) for p in order]
    if not nf0 and len(null_idx):
        blocks.append(("null", None))

    out_types = [t for _, _, t in output]
    sd = SpillDir(catalog, "sort")
    writer = SpillWriter(sd, out_types)
    names = [nm for nm, _, _ in output]
    try:
        for kind, p in blocks:
            idx = null_idx if kind == "null" else \
                nonnull[pid[nonnull] == p] if valid is not None else \
                np.nonzero(pid == p)[0]
            if len(idx) == 0:
                continue
            pe = TableEntry(_TMP_NAME, [ColumnDef(key, t)
                                        for _, key, t in chunk_out])
            pe.nrows = len(idx)
            for _, key, t in chunk_out:
                def loader(key=key, idx=idx):
                    d, v, dvv = tmp.host_column(key)
                    return (np.asarray(d)[idx],
                            None if v is None else np.asarray(v)[idx], dvv)
                pe.set_lazy_column(key, loader)
            ex = Executor(catalog)
            ex._in_chunked = True
            ex._scan_overrides = {_TMP_NAME: pe}
            r = ex.run(part_plan, output)
            writer.append(r.columns, r.nrows)
            if cap is not None and writer.nrows >= cap:
                break
        cols = writer.finish()
        total = writer.nrows
        lo = limit_node.offset or 0 if limit_node is not None else 0
        hi = min(total, cap) if cap is not None else total
        if lo or hi != total:
            cols = [(d[lo:hi], None if v is None else v[lo:hi], dvv)
                    for d, v, dvv in cols]
        from duckdb_tpu.execution.executor import Result
        return Result(names=names, types=out_types, columns=cols,
                      nrows=max(hi - lo, 0))
    except Exception:
        sd.delete()
        raise
    # NOTE: the SpillDir intentionally survives on success — the Result's
    # memmap columns read from it lazily; files are reclaimed when the OS
    # temp dir is cleaned or the process exits.
