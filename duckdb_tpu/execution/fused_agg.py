"""Fused scan→filter→join*→project→aggregate pipeline: ONE jitted XLA program.

This is the TPU answer to the reference's tightest loops — morsel-driven
scan feeding GroupedAggregateHashTable::AddChunk
(/root/reference/src/execution/aggregate_hashtable.cpp:371) and the hash
join probe chain (/root/reference/src/execution/join_hashtable.cpp:1178).
Instead of a per-chunk interpreter, the whole pipeline over the whole
padded block is traced once per (plan node, block size) and re-dispatched
as a single fused program: filters, join probes, expression arithmetic,
group-id computation and segment reductions all fuse; XLA tiles them
across the VPU.

Join fusion passes build-side state as program INPUTS (aux arrays through
tracing.run_jitted), not trace constants — capturing multi-MB LUTs as
constants blew up XLA compile 7× for no warm win (measured round 2,
PERF.md). Each build side executes eagerly (recursively fusable) and
becomes either a dense direct-address LUT (small packed-key domain) or a
sorted key table probed with searchsorted (composite/wide domains); both
probe as one vectorized gather inside the fused program.

The pipeline compacts IN-TRACE after its restrictive prefix (filters +
probes against filtered builds): with a learned row-count cap (verified
through the executor's deferred-scalar channel, rerun on overflow), the
join tail, expression evaluation, and grouping all run at the compacted
length. Grouping strategy:
- dense mixed-radix ids + grouped_reduce when every group key has a
  statically bounded domain (stats/dict/date-derived) — the
  PerfectAggregateHashTable analog;
- otherwise an in-trace sort-group (lax.sort over key columns + segment
  reductions at the compacted length) — the GroupedAggregateHashTable
  analog, still inside the same single program.

`build_fused_agg(executor, node)` exposes the traced body so the query
tail (projection/order/limit, executor._run_fused_tail) can compose the
ENTIRE query into a single device program — one dispatch, one transfer.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EMPTY_BOOL_CACHE = []


def _empty_bool():
    if not _EMPTY_BOOL_CACHE:
        _EMPTY_BOOL_CACHE.append(jnp.ones((0,), jnp.bool_))
    return _EMPTY_BOOL_CACHE[0]


from duckdb_tpu.blocks import Column, pad_bucket
from duckdb_tpu.ops.compact import compact_indices
from duckdb_tpu.planner import plan as P
from duckdb_tpu.planner import bound as B
from duckdb_tpu.types import BIGINT, DOUBLE, TypeId

PERFECT_LIMIT = 1 << 23
DENSE_LUT_LIMIT = 1 << 27  # direct-address join LUT cap (int32 slots)
_I64_MAX = int(np.iinfo(np.int64).max)

_FUSABLE_AGGS = {"sum", "count", "count_star", "avg", "mean", "min", "max"}


def max_abs_bound(expr, src) -> Optional[int]:
    """Upper bound on |scaled value| of an int-typed expression, from
    zone-map stats (None = unbounded). Drives the exact->wide sum switch."""
    if isinstance(expr, B.BoundLiteral):
        v = expr.value
        return abs(int(v)) if isinstance(v, (int, np.integer)) else None
    if isinstance(expr, (B.BoundColumnRef, B.BoundAggregateRef)):
        try:
            rng = src.stats_range(expr.key)
        except (KeyError, AttributeError):
            return None
        if rng is None:
            return None
        return max(abs(rng[0]), abs(rng[1]))
    if isinstance(expr, B.BoundArithmetic):
        lb = max_abs_bound(expr.left, src)
        rb = max_abs_bound(expr.right, src)
        if lb is None or rb is None:
            return None
        lt, rt = expr.left.ltype, expr.right.ltype
        t = expr.ltype
        if t.id is TypeId.DECIMAL:
            sl = lt.scale if lt.id is TypeId.DECIMAL else 0
            sr = rt.scale if rt.id is TypeId.DECIMAL else 0
            if expr.op in ("+", "-"):
                s = t.scale
                return lb * 10 ** (s - sl) + rb * 10 ** (s - sr)
            if expr.op == "*":
                return lb * rb
            return None
        if expr.op in ("+", "-"):
            return lb + rb
        if expr.op == "*":
            return lb * rb
        return None
    if isinstance(expr, B.BoundCast):
        cb = max_abs_bound(expr.child, src)
        if cb is None:
            return None
        st, t = expr.child.ltype, expr.ltype
        if t.id is TypeId.DECIMAL:
            ss = st.scale if st.id is TypeId.DECIMAL else 0
            return cb * 10 ** max(0, t.scale - ss)
        return cb
    if isinstance(expr, B.BoundNegate):
        return max_abs_bound(expr.child, src)
    if isinstance(expr, B.BoundCase):
        # bound = max over result branches (conditional counting:
        # sum(CASE WHEN p THEN 1 ELSE 0 END) must stay on the narrow path)
        bounds = [max_abs_bound(r, src) for _, r in expr.whens]
        bounds.append(max_abs_bound(expr.else_expr, src)
                      if expr.else_expr is not None else 0)
        if any(b is None for b in bounds):
            return None
        return max(bounds)
    return None


def sum_needs_wide(agg, src, nrows: int) -> bool:
    """True if SUM may exceed int64 → use the hi/lo exact accumulation."""
    if not (agg.func == "sum" and agg.args
            and (agg.args[0].ltype.is_integer
                 or agg.args[0].ltype.id is TypeId.HUGEINT
                 or (agg.args[0].ltype.id is TypeId.DECIMAL
                     and agg.ltype.width > 18))):
        return False
    b = max_abs_bound(agg.args[0], src)
    if b is None:
        return True
    return b * max(1, nrows) >= (1 << 62)


def _expr_lo_hi(expr, lookup) -> Optional[Tuple[int, int]]:
    """Static (lo, hi) bounds of an integer-valued expression.

    lookup(key) -> (lo, hi)|None resolves column refs (table stats, dict
    length, build-side stats). Handles the date-part family over bounded
    DATE columns so `extract(year from o_orderdate)`-style group keys can
    still take the dense perfect-group path (reference sizes its perfect
    aggregate HT from stats the same way,
    src/execution/perfect_aggregate_hashtable.cpp)."""
    if isinstance(expr, B.BoundLiteral):
        v = expr.value
        if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
            return (int(v), int(v))
        return None
    if isinstance(expr, (B.BoundColumnRef, B.BoundAggregateRef)):
        return lookup(expr)
    if isinstance(expr, B.BoundCast):
        if expr.ltype.is_integer or expr.ltype.id in (TypeId.DATE,):
            inner = _expr_lo_hi(expr.child, lookup)
            if inner is not None and (expr.child.ltype.is_integer
                                      or expr.child.ltype.id is TypeId.DATE):
                return inner
        return None
    if isinstance(expr, B.BoundFunction) and len(expr.args) == 1 \
            and isinstance(expr.args[0], (B.BoundColumnRef,
                                          B.BoundAggregateRef)) \
            and expr.args[0].ltype.id is TypeId.DATE:
        rng = lookup(expr.args[0])
        if rng is None:
            return None
        import datetime

        epoch = datetime.date(1970, 1, 1)
        try:
            dlo = epoch + datetime.timedelta(days=rng[0])
            dhi = epoch + datetime.timedelta(days=rng[1])
        except OverflowError:
            return None
        part = expr.name
        if part.startswith("extract_"):
            part = part[len("extract_"):]
        if part in ("extract", "date_part") and expr.impl is not None:
            # the part name is baked into the impl closure (functions.py
            # _extract_impl); recover it for bounds derivation
            for cell in (expr.impl.__closure__ or ()):
                if isinstance(cell.cell_contents, str):
                    part = cell.cell_contents
                    break
        if part == "year":
            return (dlo.year, dhi.year)
        if part == "month":
            return (1, 12)
        if part == "day":
            return (1, 31)
        if part == "quarter":
            return (1, 4)
        return None
    if isinstance(expr, B.BoundArithmetic) and expr.op in ("+", "-", "*"):
        lb = _expr_lo_hi(expr.left, lookup)
        rb = _expr_lo_hi(expr.right, lookup)
        if lb is None or rb is None:
            return None
        if expr.ltype.id is TypeId.DECIMAL:
            return None  # scale bookkeeping: not needed for group keys
        if expr.op == "+":
            return (lb[0] + rb[0], lb[1] + rb[1])
        if expr.op == "-":
            return (lb[0] - rb[1], lb[1] - rb[0])
        prods = [a * b for a in lb for b in rb]
        return (min(prods), max(prods))
    return None


class FusedAgg:
    """Prepared fused-aggregate: base batch + a traced body.

    body(env over base columns + aux) → (cols: key→Column sized (total,),
    occ: int32 (total,), extras: tuple of deferred device scalars).
    Slot `i` is live iff occ[i] > 0. `extras_cb[j]` is the deferred-scalar
    callback for extras[j] (executor.defer_scalar channel).

    dense=True additionally provides the distributed split
    (body_partials + finalize with flat combine kinds) used by the
    shard_map path.
    """

    def __init__(self, base_batch, needed, body, total, out_types, aux,
                 extras_cb, dense, body_partials=None, finalize=None,
                 partial_kinds=None, variant=(), array_extras_cb=()):
        self.variant = variant  # body-shaping constants → trace cache key
        self.base_batch = base_batch
        self.needed = needed
        self.body = body
        self.total = total
        self.out_types = out_types  # key → (ltype, dict_values|None)
        self.aux = aux  # name → device array (program inputs)
        self.extras_cb = extras_cb
        self.dense = dense
        self.body_partials = body_partials
        self.finalize = finalize
        self.partial_kinds = partial_kinds  # flat combine kinds (sum/min/max)
        # callbacks for DEVICE-ARRAY extras appended after the scalar
        # extras (probe-result caching); called with the device array, no
        # host sync
        self.array_extras_cb = array_extras_cb


class _JoinStep:
    """One fused probe step: build side prepped eagerly, probed in-trace.

    mode "dense": aux lut (size,) int32 — full packed key → build row
    (unique builds, full domain ≤ DENSE_LUT_LIMIT).
    mode "bucket": direct-address on ONE subset key with Bc candidate
    rows per slot, resolved by comparing the FULL packed key (aux bt =
    (S·Bc,) build rows, aux bk = full packed build keys). Bc=1 is the
    unique-subset fast path (e.g. a composite key whose first column is
    already a PK); Bc>1 covers low-duplication subset keys (partsupp's
    ps_partkey). One gather of Bc candidates — no searchsorted chain.
    mode "sorted": aux sk/sp — searchsorted fallback for wide domains.
    Build columns the pipeline touches ride as full-plane aux arrays and
    are gathered at the probe's (compacted) length in-trace.
    """

    def __init__(self, pfx, mode, probe_keys, los, rngs, strides, size,
                 build_plen, aux, build_src, subset_idx=0, bucket_width=1,
                 subset_size=0, kdt=jnp.int64):
        self.kdt = kdt  # packed-key dtype (int32 when the domain fits)
        self.pfx = pfx
        self.mode = mode
        self.probe_keys = probe_keys
        self.los = los
        self.rngs = rngs
        self.strides = strides
        self.size = size
        self.build_plen = build_plen
        self.aux = aux  # this step's aux entries (shared dict slice)
        self.build_src = build_src  # eager ColSource for stats/templates
        self.build_cols: Dict[str, Column] = {}  # key → template (metadata)
        self.phase1 = False
        self.extra = None  # residual predicate (semi/anti + unique build)
        self.subset_idx = subset_idx  # bucket mode: which key addresses
        self.bucket_width = bucket_width  # Bc
        self.subset_size = subset_size  # S
        self.aux_entries: Dict[str, jnp.ndarray] = {}  # this step's inputs

    def register_build_col(self, key) -> bool:
        if key in self.build_cols:
            return True
        try:
            col = self.build_src[key]
        except KeyError:
            return False
        self.build_cols[key] = col
        self.aux_entries[f"{self.pfx}.{key}.d"] = col.data
        if col.validity is not None:
            self.aux_entries[f"{self.pfx}.{key}.v"] = col.validity
        if col.data_hi is not None:
            self.aux_entries[f"{self.pfx}.{key}.h"] = col.data_hi
        for k2 in (f"{self.pfx}.{key}.d", f"{self.pfx}.{key}.v",
                   f"{self.pfx}.{key}.h"):
            if k2 in self.aux_entries:
                self.aux[k2] = self.aux_entries[k2]
        return True

    def probe(self, env, p, live):
        """In-trace probe → (bidx int32 (p,), live∧found, found).

        `found` is the LIVE-INDEPENDENT key match mask (key in range,
        non-NULL, present in the build) — the cacheable part of the probe:
        it depends only on the two tables, never on this query's filters.
        """
        kdt = self.kdt
        packed = jnp.zeros((p,), kdt)
        ok = jnp.ones((p,), jnp.bool_)
        digits = []
        for e, lo, rng, st_ in zip(self.probe_keys, self.los, self.rngs,
                                   self.strides):
            c = e.eval(env)
            v = jnp.broadcast_to(c.data, (p,))
            # range check in the column's own dtype (probe values may
            # exceed the packed domain); the in-range digit then fits kdt.
            # Bounds outside the dtype's representable range clamp (the
            # comparison is then vacuous / impossible, decided statically)
            hi = lo + rng - 1
            info = np.iinfo(v.dtype) if v.dtype.kind in "iu" else None
            if info is not None and (lo > info.max or hi < info.min):
                # domains are statically disjoint: no probe row can match
                okk = jnp.zeros((p,), jnp.bool_)
                digit = jnp.zeros((p,), kdt)
            else:
                lo_c = lo if info is None else max(lo, int(info.min))
                hi_c = hi if info is None else min(hi, int(info.max))
                okk = jnp.logical_and(v >= v.dtype.type(lo_c),
                                      v <= v.dtype.type(hi_c))
                # digit only needs to be exact where okk holds (dead rows
                # are masked by `ok`; all gathers clip)
                if v.dtype.itemsize >= 8:
                    # int64 probe values: subtract in-source, then narrow
                    digit = jnp.clip(v - v.dtype.type(lo), 0,
                                     rng - 1).astype(kdt)
                elif kdt == jnp.int32 and -(2 ** 31) <= lo < 2 ** 31:
                    digit = jnp.clip(v.astype(kdt) - kdt(lo), kdt(0),
                                     kdt(rng - 1))
                else:
                    digit = jnp.clip(v.astype(jnp.int64) - lo, 0,
                                     rng - 1).astype(kdt)
            if c.validity is not None:
                okk = jnp.logical_and(okk,
                                      jnp.broadcast_to(c.validity, (p,)))
            digits.append(digit)
            packed = packed + digit * kdt(st_)
            ok = jnp.logical_and(ok, okk)
        if self.mode == "dense":
            lut = env.aux[f"{self.pfx}.lut"]
            bidx = lut[jnp.clip(packed, 0, self.size - 1)]
        elif self.mode == "bucket":
            bt = env.aux[f"{self.pfx}.bt"]
            bk = env.aux[f"{self.pfx}.bk"]
            Bc = self.bucket_width
            sv = digits[self.subset_idx].astype(jnp.int32)
            cand = bt.reshape(self.subset_size, Bc)[
                jnp.clip(sv, 0, self.subset_size - 1)]  # (p, Bc)
            ck = bk[jnp.clip(cand, 0, self.build_plen - 1)]
            eq = jnp.logical_and(cand >= 0, ck == packed[:, None])
            bidx = jnp.max(jnp.where(eq, cand, -1), axis=1)
        else:
            sk = env.aux[f"{self.pfx}.sk"]
            sp = env.aux[f"{self.pfx}.sp"]
            pos = jnp.searchsorted(sk, packed)
            posc = jnp.clip(pos, 0, sk.shape[0] - 1)
            hit = sk[posc] == packed
            bidx = jnp.where(hit, sp[posc], -1)
        found = jnp.logical_and(ok, bidx >= 0)
        return bidx.astype(jnp.int32), jnp.logical_and(live, found), found

    def register_lazy(self, env, bidx):
        """Register this step's build columns into env as LAZY providers:
        the gather at probe length only enters the trace if something
        downstream actually reads the column (late materialization)."""
        for k in self.build_cols:
            env._overlay[k] = _LazyGatherCol(self, k, bidx)


def _extra_found(step, env2, p, bidx, found):
    """Fold a semi/anti residual into the membership mask: gather the
    (unique) matched build row's columns, evaluate the predicate, AND it
    with `found`. NULL predicate results are never TRUE (SQL three-valued
    semi-join semantics, reference ScanKeyMatches)."""
    step.register_lazy(env2, bidx)
    c = step.extra.eval(env2)
    ok = jnp.broadcast_to(c.data.astype(jnp.bool_), (p,))
    if c.validity is not None:
        ok = jnp.logical_and(ok, jnp.broadcast_to(c.validity, (p,)))
    return jnp.logical_and(found, ok)


class _LazyGatherCol:
    """Overlay provider: gathers one build column by the probe's bidx on
    first access (TraceEnv caches the result in _cols)."""

    def __init__(self, step, key, bidx):
        self.step = step
        self.key = key
        self.bidx = bidx

    def eval(self, env):
        step, k = self.step, self.key
        tmpl = step.build_cols[k]
        bc = jnp.clip(self.bidx, 0, step.build_plen - 1)
        data = env.aux[f"{step.pfx}.{k}.d"][bc]
        vkey = f"{step.pfx}.{k}.v"
        validity = env.aux[vkey][bc] if vkey in env.aux else None
        hkey = f"{step.pfx}.{k}.h"
        data_hi = env.aux[hkey][bc] if hkey in env.aux else None
        return Column(data=data, ltype=tmpl.ltype, validity=validity,
                      dict_values=tmpl.dict_values, data_hi=data_hi)


def _subtree_filters(node) -> bool:
    """True if the build subtree restricts rows (Filter / semi / anti /
    inner join anywhere below) — such probes run BEFORE compaction."""
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, (P.Filter, P.Limit)):
            return True
        if isinstance(n, P.Join):
            return True  # any join below can drop build rows
        for attr in ("child", "probe", "build", "left", "right"):
            c = getattr(n, attr, None)
            if c is not None:
                stack.append(c)
    return False


def _scan_versions(executor, node):
    """(table, version) for every Scan under `node` — the build-prep cache
    key. None if any table is override-substituted (chunked views)."""
    out = []
    stack = [node]
    ov = getattr(executor, "_scan_overrides", None)
    while stack:
        n = stack.pop()
        if isinstance(n, P.Scan):
            if ov is not None and n.table in ov:
                return None
            ent = executor.catalog.get_table(n.table)
            out.append((n.table, ent.nrows, getattr(ent, "version", 0)))
        for attr in ("child", "probe", "build", "left", "right"):
            c = getattr(n, attr, None)
            if c is not None:
                stack.append(c)
    return tuple(sorted(out))


# build-prep cache row-count bound: cached steps pin build column planes
# in device memory, so very large builds re-prep each run instead
PREP_CACHE_MAX_BUILD = 1 << 25


def _cache_store(node, attr: str):
    """Per-node device-pinning cache dict, registered for HBM-pressure
    eviction (execution/cache_registry.py)."""
    store = node.__dict__.get(attr)
    if store is None:
        from duckdb_tpu.execution.cache_registry import tracked_dict

        store = node.__dict__[attr] = tracked_dict()
    return store


def _prep_join_step(executor, j: P.Join, pfx: str,
                    aux: Dict) -> Optional[_JoinStep]:
    """Execute the build side eagerly and prepare probe state as aux
    arrays. No host syncs: key bounds come from catalog stats through the
    lazy ColSource chain; uniqueness from catalog distinct counts
    (executor._build_known_unique).

    The prepped step (LUT/bucket table + build planes) is CACHED on the
    join node keyed by the build subtree's table versions: a warm query
    skips the entire build-side execution — the reference's hash table
    lives for one query (join_hashtable.cpp), ours persists like an index
    until the data changes."""
    if j.jtype not in ("inner", "semi", "anti") or j.null_aware:
        return None
    if j.extra is not None and j.jtype == "inner":
        # semi/anti residuals evaluate on the (unique) matched build row;
        # inner residuals change the match itself → eager path
        return None
    vkey = _scan_versions(executor, j.build)
    forced_sorted = getattr(j, "_bucket_overflowed", False)
    cache = _cache_store(j, "_prep_cache")
    if vkey is not None:
        cached = cache.get((vkey, forced_sorted))
        if cached is not None:
            step = cached
            # re-link into this run's shared aux dict
            aux.update(step.aux_entries)
            step.aux = aux
            return step
    step = _prep_join_step_fresh(executor, j, pfx, aux, forced_sorted)
    if step is not None:
        step.vkey = vkey  # build-subtree version key (probe-cache keying)
        step.jtype = j.jtype  # set HERE so cached steps stay consistent
        step.extra = j.extra
        if j.extra is not None:
            # residual refs to build columns ride as gathered aux planes
            for nn in B.walk(j.extra):
                if isinstance(nn, B.BoundColumnRef):
                    step.register_build_col(nn.key)
    if step is not None and vkey is not None \
            and step.build_plen <= PREP_CACHE_MAX_BUILD:
        cache.clear()
        cache[(vkey, forced_sorted)] = step
    return step


def _prep_join_step_fresh(executor, j: P.Join, pfx: str, aux: Dict,
                          forced_sorted: bool) -> Optional[_JoinStep]:
    bb = executor.execute(j.build)
    if not executor._build_known_unique(j, bb) \
            and (j.jtype not in ("semi", "anti") or j.extra is not None):
        # inner probes need ≤1 match per row; semi/anti only membership,
        # so duplicate build keys are fine (LUT last-wins) — EXCEPT with a
        # residual, which must evaluate on THE matched row (unique only)
        return None
    env_b = bb.env()
    key_cols = []
    for e in j.build_keys:
        c = e.eval(env_b)
        if c.ltype.id is TypeId.VARCHAR or c.ltype.is_float:
            return None  # dict-rank alignment / float keys: eager path
        key_cols.append(c)
    los, rngs = [], []
    for e, c in zip(j.build_keys, key_cols):
        bounds = executor._key_bounds(bb, e)
        if bounds is None:
            # no catalog stats (aggregate/derived build side): measure the
            # executed build column once — the sync is warmup-only, the
            # result rides the build-prep cache keyed by table versions
            d = jnp.broadcast_to(c.data, (bb.plen,)).astype(jnp.int64)
            lv = bb.live
            if c.validity is not None:
                lv = jnp.logical_and(lv, jnp.broadcast_to(
                    c.validity, (bb.plen,)))
            if not bool(jnp.any(lv)):
                bounds = (0, 0)
            else:
                bounds = (int(jnp.min(jnp.where(lv, d, 2**62))),
                          int(jnp.max(jnp.where(lv, d, -2**62))))
        lo, hi = bounds
        los.append(lo)
        rngs.append(max(hi - lo + 1, 1))
    size = 1
    for r in rngs:
        size *= r
        if size > (1 << 62):
            return None
    strides = []
    st = 1
    for r in reversed(rngs):
        strides.append(st)
        st *= r
    strides.reverse()
    # packed-key dtype: int32 whenever the full packed domain fits — the
    # TPU has no native 64-bit, so int64 multiply-accumulate chains and
    # int64 gather indices are x64-EMULATED (~2-4× cost, PERF.md); the
    # packed value is bounded by `size` by construction so the narrow
    # dtype is exact
    kdt = jnp.int32 if size < (1 << 31) - 1 else jnp.int64
    # packed build keys + live mask (device, async)
    packed = jnp.zeros((bb.plen,), kdt)
    build_live = bb.live
    for c, lo, rng, st_ in zip(key_cols, los, rngs, strides):
        d = jnp.broadcast_to(c.data, (bb.plen,))
        if c.validity is not None:
            build_live = jnp.logical_and(
                build_live, jnp.broadcast_to(c.validity, (bb.plen,)))
        if d.dtype == jnp.int64:
            digit = jnp.clip(d - lo, 0, rng - 1).astype(kdt)
        else:
            digit = jnp.clip(d.astype(kdt) - kdt(lo), kdt(0), kdt(rng - 1))
        packed = packed + digit * kdt(st_)
    step_aux = {}
    subset_idx = 0
    bucket_width = 1
    subset_size = 0
    if size <= DENSE_LUT_LIMIT:
        rows = jnp.arange(bb.plen, dtype=jnp.int32)
        slot = jnp.where(build_live, packed, size)
        lut = jnp.full((size + 1,), -1, jnp.int32).at[slot].set(
            rows, mode="drop")[:size]
        step_aux[f"{pfx}.lut"] = lut
        mode = "dense"
    else:
        # full domain too wide for a direct LUT: address on ONE subset key
        # with ≤Bc candidate rows per slot, resolved by a full packed-key
        # compare (a searchsorted chain at probe length costs ~20 serial
        # gather rounds on TPU — measured 4.8 s on Q5; the bucket probe is
        # one Bc-wide gather). Bc comes from catalog duplication stats
        # with 2× slack, verified by a deferred overflow counter that
        # falls back to the sorted mode and re-runs.
        best = None  # (Bc, idx)
        if not forced_sorted:
            for i, (e, rng) in enumerate(zip(j.build_keys, rngs)):
                own = _key_owner(bb.src, e.key)
                if own is None:
                    continue
                ent, cn = own
                try:
                    dc = max(1, ent.distinct_count(cn))
                except Exception:  # noqa: BLE001
                    continue
                dup = -(-ent.nrows // dc)  # ceil
                Bc = 1 if dup == 1 else 1 << (dup * 2 - 1).bit_length()
                if Bc <= 16 and rng * Bc <= DENSE_LUT_LIMIT \
                        and (best is None or Bc < best[0]):
                    best = (Bc, i, rng)
        if best is not None:
            bucket_width, subset_idx, subset_size = best[0], best[1], best[2]
            Bc, S = bucket_width, subset_size
            sv = ((packed // kdt(strides[subset_idx]))
                  % kdt(rngs[subset_idx])).astype(jnp.int32)
            slot_b = jnp.where(build_live, sv, S)
            iota = jnp.arange(bb.plen, dtype=jnp.int32)
            sorted_slot, perm_s = jax.lax.sort([slot_b, iota], num_keys=1,
                                               is_stable=False)
            boundary = jnp.concatenate([
                jnp.ones((1,), jnp.bool_),
                sorted_slot[1:] != sorted_slot[:-1]])
            # cummax, NOT associative_scan (eager compile explosion,
            # ops/scan.py)
            starts = jax.lax.cummax(jnp.where(boundary, iota, 0))
            pos = iota - starts
            live_sorted = jnp.logical_and(sorted_slot < S, pos < Bc)
            flat = jnp.where(live_sorted,
                             sorted_slot * Bc + pos, S * Bc)
            bt = jnp.full((S * Bc + 1,), -1, jnp.int32).at[flat].set(
                jnp.where(live_sorted, perm_s, -1), mode="drop")[:-1]
            overflow = jnp.sum(jnp.logical_and(sorted_slot < S, pos >= Bc))

            def _check_overflow(v, j=j):
                if int(v) > 0:
                    j._bucket_overflowed = True
                    return True
                return False

            executor.defer_scalar(overflow, _check_overflow)
            step_aux[f"{pfx}.bt"] = bt
            step_aux[f"{pfx}.bk"] = jnp.where(build_live, packed, kdt(-1))
            mode = "bucket"
        else:
            iota = jnp.arange(bb.plen, dtype=jnp.int32)
            sentinel = kdt(np.iinfo(np.int32 if kdt == jnp.int32
                                    else np.int64).max)
            kb = jnp.where(build_live, packed, sentinel)
            sk, sp = jax.lax.sort([kb, iota], num_keys=1, is_stable=False)
            step_aux[f"{pfx}.sk"] = sk
            step_aux[f"{pfx}.sp"] = sp
            mode = "sorted"
    aux.update(step_aux)
    step = _JoinStep(pfx, mode, list(j.probe_keys), los, rngs, strides,
                     size, bb.plen, aux, bb.src, subset_idx=subset_idx,
                     bucket_width=bucket_width, subset_size=subset_size,
                     kdt=kdt)
    step.aux_entries.update(step_aux)
    step.phase1 = _subtree_filters(j.build)
    return step


def _key_owner(src, key):
    """(entry, colname) if `key` reaches a NON-GATHERED TableCols (one
    output row per table row); None otherwise."""
    from duckdb_tpu.execution.executor import ChainCols, TableCols

    stack = [src]
    while stack:
        s_ = stack.pop()
        if isinstance(s_, ChainCols):
            stack.extend(s_.sources)
        elif isinstance(s_, TableCols) and key in s_.keymap:
            return (s_.entry, s_.keymap[key])
    return None


def build_fused_agg(executor, node: P.Aggregate) -> Optional[FusedAgg]:
    # 1. peel Filter/Project/(inner unique-build Join) chain down to a Scan.
    #    Filters commute with inner joins; the body applies probes and
    #    filters in dependency order with a compaction point after the
    #    restrictive prefix.
    chain = []
    join_nodes = []
    base = node.child
    while isinstance(base, (P.Filter, P.Project, P.Join)):
        if isinstance(base, P.Join):
            # semi/anti probes fuse as pure MEMBERSHIP masks (no build
            # column gathers, duplicate build keys fine) — the TPC-H Q18
            # IN-subquery shape (reference: semi joins in
            # physical_hash_join.cpp)
            if (base.jtype not in ("inner", "semi", "anti")
                    or (base.extra is not None
                        and base.jtype == "inner")
                    or base.null_aware):
                return None
            join_nodes.append(base)
            base = base.probe
        else:
            chain.append(base)
            base = base.child
    if not isinstance(base, P.Scan):
        return None
    chain.reverse()
    join_nodes.reverse()  # innermost (closest to scan) first

    aux: Dict[str, jnp.ndarray] = {}
    join_steps: List[_JoinStep] = []
    for i, j in enumerate(join_nodes):
        step = _prep_join_step(executor, j, f"j{i}", aux)
        if step is None:
            return None
        join_steps.append(step)

    for agg in node.aggs:
        if agg.func not in _FUSABLE_AGGS or agg.distinct:
            return None
        if len(agg.args) > 1:
            return None
        if agg.ltype.id is TypeId.VARCHAR:
            return None  # min/max over strings: dict plumbing → general path

    # 2. projection overlay
    project_items = {}
    for nd in chain:
        if isinstance(nd, P.Project):
            for k, e in nd.items:
                project_items[k] = e

    def resolve(e):
        while isinstance(e, B.BoundColumnRef) and e.key in project_items:
            e = project_items[e.key]
        return e

    group_resolved = [(gkey, resolve(ge)) for gkey, ge in node.groups]

    # 3. base batch + column routing (base scan vs join build sides)
    base_batch = executor.execute(base)
    plen = base_batch.plen
    entry = executor._get_table(base.table)
    key2col = {key: col for col, key, _ in base.cols}

    needed: List[str] = []

    def collect(e):
        for nn in B.walk(e):
            if isinstance(nn, B.BoundColumnRef):
                if nn.key in key2col:
                    if nn.key not in needed:
                        needed.append(nn.key)
                elif nn.key in project_items:
                    continue  # overlay expr, its refs collected separately
                else:
                    for step in join_steps:
                        if nn.key in step.build_cols:
                            break
                        if step.register_build_col(nn.key):
                            break

    for nd in chain:
        if isinstance(nd, P.Filter):
            collect(nd.expr)
        else:
            for _, e in nd.items:
                collect(e)
    for _, e in project_items.items():
        collect(e)
    for _, ge in group_resolved:
        collect(ge)
    for agg in node.aggs:
        for a in agg.args:
            collect(a)
    for step in join_steps:
        for e in step.probe_keys:
            collect(e)
        if step.extra is not None:
            collect(step.extra)  # probe-side residual refs

    base_cols = {k: base_batch.src[k] for k in needed}

    def col_lookup(key):
        if key in base_cols:
            return base_cols[key]
        for step in join_steps:
            if key in step.build_cols:
                return step.build_cols[key]
        return None

    def ref_bounds(ref):
        """(lo, hi) for a column ref: base-table stats, dict length, or
        build-side stats through the lazy source chain."""
        c = col_lookup(ref.key)
        if c is None:
            return None
        if c.ltype.id is TypeId.VARCHAR:
            return (0, len(c.dict_values)) if c.dict_values is not None \
                else None
        if c.ltype.is_float:
            return None
        if ref.key in key2col:
            st = entry.stats_for(key2col[ref.key])
            if st.min_val is None or st.max_val is None:
                return None
            return (int(st.min_val), int(st.max_val))
        for step in join_steps:
            if ref.key in step.build_cols:
                try:
                    rng = step.build_src.stats_range(ref.key)
                except KeyError:
                    return None
                return (int(rng[0]), int(rng[1])) if rng is not None else None
        return None

    # 4. grouping strategy: dense when every key is statically bounded
    mins, domains = [], []
    dense_mode = True
    for _, ge in group_resolved:
        c_meta = (col_lookup(ge.key)
                  if isinstance(ge, (B.BoundColumnRef, B.BoundAggregateRef))
                  else None)
        if c_meta is None and isinstance(ge, (B.BoundColumnRef,
                                              B.BoundAggregateRef)):
            return None  # unresolvable ref
        if ge.ltype.id is TypeId.VARCHAR and not isinstance(
                ge, (B.BoundColumnRef, B.BoundAggregateRef)):
            return None  # computed VARCHAR group key: dict is data-dependent
        b = _expr_lo_hi(ge, ref_bounds)
        if b is None:
            dense_mode = False
            break
        mins.append(b[0])
        domains.append(b[1] - b[0] + 2)  # +1 slot for NULL
    total = 1
    if dense_mode:
        for d in domains:
            total *= d
            if total > PERFECT_LIMIT:
                dense_mode = False
                break
    if not dense_mode and not node.groups:
        return None  # ungrouped always dense (single slot)

    from duckdb_tpu.execution.tracing import prefetch_scalar_subqueries

    all_exprs = [nd.expr for nd in chain if isinstance(nd, P.Filter)]
    for nd in chain:
        if isinstance(nd, P.Project):
            all_exprs += [e for _, e in nd.items]
    for agg in node.aggs:
        all_exprs += agg.args
    for step in join_steps:
        all_exprs += step.probe_keys
    prefetch_scalar_subqueries(all_exprs)

    filters = [nd.expr for nd in chain if isinstance(nd, P.Filter)]
    proj_list = list(project_items.items())
    out_types = {}
    for (gkey, ge) in group_resolved:
        if isinstance(ge, (B.BoundColumnRef, B.BoundAggregateRef)):
            c = col_lookup(ge.key)
            out_types[gkey] = (c.ltype, c.dict_values)
        else:
            out_types[gkey] = (ge.ltype, None)
    for agg in node.aggs:
        out_types[agg.key] = (agg.ltype, None)

    strides = []
    stride = 1
    for d in reversed(domains):
        strides.append(stride)
        stride *= d
    strides.reverse()

    # static per-key bounds for the SORT-GROUP path: bounded keys pack
    # multiplicatively into few int64 words, keeping the TPU sort
    # comparator small. A 7-key GROUP BY (TPC-H Q10) otherwise sorts 16
    # operands / 15 keys — a 30+-parameter comparator that the TPU sort
    # emitter compiles for >19 MINUTES (x64 emulation doubles it again);
    # packed it is 2-3 words and compiles in seconds.
    sort_key_bounds = []
    if not dense_mode:
        for _, ge in group_resolved:
            if ge.ltype.id is TypeId.VARCHAR and not isinstance(
                    ge, (B.BoundColumnRef, B.BoundAggregateRef)):
                sort_key_bounds.append(None)
            elif ge.ltype.is_float:
                sort_key_bounds.append(None)
            else:
                sort_key_bounds.append(_expr_lo_hi(ge, ref_bounds))

    # static combine kinds per aggregate (distributed Combine phase)
    partial_kinds = []
    for agg in node.aggs:
        if agg.func in ("count_star", "count"):
            partial_kinds.append(["sum"])
        elif sum_needs_wide(agg, base_batch.src, entry.nrows):
            agg._wide = True
            partial_kinds.append(["sum", "sum", "sum"])  # hi, lo, count
        elif agg.func in ("sum", "avg", "mean"):
            agg._wide = False
            partial_kinds.append(["sum", "sum"])
        else:  # min / max
            partial_kinds.append([agg.func, "sum"])
    arg_types = [(agg.args[0].ltype if agg.args else BIGINT)
                 for agg in node.aggs]

    # phase split: probes against RESTRICTIVE builds (filtered subtrees)
    # run before compaction so the compacted length reflects their
    # selectivity; probes against unfiltered dimension builds defer to
    # phase 2 and run at the compacted length (their masks still apply —
    # rows they would drop just waste compacted slots)
    def _all_refs(e, acc):
        pending = [e]
        seen = set()
        while pending:
            x = pending.pop()
            for nn in B.walk(x):
                if isinstance(nn, B.BoundColumnRef):
                    if nn.key in project_items and nn.key not in seen:
                        seen.add(nn.key)
                        pending.append(project_items[nn.key])
                    elif nn.key not in project_items:
                        acc.add(nn.key)

    phase1_steps: List[_JoinStep] = []
    phase2_steps: List[_JoinStep] = []
    avail = set(key2col)
    for step in join_steps:
        refs = set()
        for e in step.probe_keys:
            _all_refs(e, refs)
        if step.extra is not None:
            _all_refs(step.extra, refs)
            refs -= set(step.build_cols)  # own gathered cols aren't deps
        if step.phase1 and refs <= avail:
            phase1_steps.append(step)
            avail |= set(step.build_cols)
        else:
            phase2_steps.append(step)

    def _refs_build_cols(f):
        pending = [f]
        seen = set()
        while pending:
            e = pending.pop()
            for nn in B.walk(e):
                if isinstance(nn, B.BoundColumnRef):
                    if nn.key in project_items and nn.key not in seen:
                        seen.add(nn.key)
                        pending.append(project_items[nn.key])
                    elif nn.key not in key2col \
                            and nn.key not in project_items:
                        return True
        return False

    # filters over base columns only run before compaction; anything
    # touching a join's build columns runs after every probe (phase 2)
    filters1 = [f for f in filters if not _refs_build_cols(f)]
    filters2 = [f for f in filters if _refs_build_cols(f)]

    # ---- staged schedule with learned cardinalities (single-chip) -------
    # Each stage's post-stage live count is LEARNED across runs (deferred
    # scalars riding the result transfer); restrictive probes sort by
    # learned selectivity (dependencies permitting) and a compaction is
    # inserted whenever the expected row count falls ≥2× below the current
    # frame — downstream probes/expressions then run at the shrunken
    # length. Stale caps (data drift) truncate, are detected by the same
    # deferred counters, and re-run the plan. Reference analog: join-order
    # selectivity + SelectionVector chaining (src/optimizer/join_order/,
    # DataChunk slicing), recast as static program shapes + learning.
    stage_counts: Dict = node.__dict__.setdefault("_fused_stage_counts", {})

    def _stage_id(step):
        return ("probe", join_steps.index(step))

    order_hint = {s: stage_counts.get(_stage_id(s), None)
                  for s in phase1_steps}
    # the learned post-stage counts are POSITION-dependent (each stage
    # measures the live count after every earlier stage applied), so
    # re-sorting on every run can flip two stages forever: each flip
    # invalidates the other's count, exceeds its stale compaction cap,
    # and forces the 4-attempt rerun loop on EVERY warm query (measured:
    # q21 ran its fused program 5x per call). The order therefore
    # FREEZES once chosen with full hints; caps keep adapting.
    saved = node.__dict__.get("_fused_probe_order")
    by_idx = {join_steps.index(s): s for s in phase1_steps}
    if saved is not None and set(saved) == set(by_idx):
        phase1_ordered = [by_idx[i] for i in saved]
    else:
        # sort restrictive probes by learned post-probe count (unknown
        # last), then repair dependency order (probe keys over earlier
        # build cols)
        p1 = sorted(phase1_steps,
                    key=lambda s: (order_hint[s] is None,
                                   order_hint[s] if order_hint[s] is not None
                                   else 0))
        ordered, avail2 = [], set(key2col)
        pending = list(p1)
        while pending:
            moved = False
            for s in list(pending):
                refs = set()
                for e in s.probe_keys:
                    _all_refs(e, refs)
                if s.extra is not None:
                    _all_refs(s.extra, refs)
                    refs -= set(s.build_cols)
                if refs <= avail2:
                    ordered.append(s)
                    avail2 |= set(s.build_cols)
                    pending.remove(s)
                    moved = True
            if not moved:  # cycle (cannot happen): keep original order
                ordered.extend(pending)
                break
        phase1_ordered = ordered
        if phase1_steps and all(order_hint[s] is not None
                                for s in phase1_steps):
            node._fused_probe_order = [join_steps.index(s)
                                       for s in phase1_ordered]

    allow_compact = plen > (1 << 16)
    schedule = [("filters", "f1")]
    for s in phase1_ordered:
        schedule.append(("probe", s))
    for s in phase2_steps:
        schedule.append(("probe", s))
    schedule.append(("filters", "f2"))

    # insert compaction points from learned counts
    final_cap = plen
    if allow_compact:
        cur_cap = plen
        out_sched = []
        fallback = getattr(node, "_fused_n_live",
                           getattr(node, "_last_n_live", None))
        for i, op in enumerate(schedule):
            out_sched.append(op)
            if op[0] == "filters" and op[1] == "f2":
                break
            # a compaction only pays when something downstream runs at the
            # shrunken length: more probes, a sort-group, or a wide dense
            # domain (a cheap masked-reduce tail is faster un-compacted)
            probes_after = any(o[0] == "probe" for o in schedule[i + 1:])
            if not (probes_after or not dense_mode or total > (1 << 10)):
                continue
            sid = ("filters", "f1") if op[0] == "filters" \
                else _stage_id(op[1])
            cnt = stage_counts.get(sid)
            if cnt is None and i == 0 and fallback is None \
                    and op[0] == "filters" and filters1:
                cnt = plen >> 3  # first-run guess after base filters
            if cnt is not None:
                cap = max(1 << 15, pad_bucket(int(cnt * 5 // 4) + 1))
                if cap <= cur_cap // 2:
                    out_sched.append(("compact", cap, sid))
                    cur_cap = cap
        schedule = out_sched
        final_cap = cur_cap

    if not dense_mode:
        out_cap = max(128, pad_bucket(final_cap))
    else:
        out_cap = total

    # stage-count learning callbacks, built STATICALLY in schedule order
    # (the traced body may be a cache hit that never re-executes Python,
    # so the extras→callback pairing cannot be built at trace time)
    _caps_after = {}
    for op in schedule:
        if op[0] == "compact":
            _caps_after[op[2]] = op[1]

    def _make_learn(sid, node=node):
        cap = _caps_after.get(sid)

        def cb(v, node=node, sid=sid, cap=cap):
            node._fused_stage_counts[sid] = int(v)
            # stale compaction cap (data drift) truncated rows → rerun
            return cap is not None and int(v) > cap

        return cb

    extras_cb: List[Callable] = []
    if allow_compact:
        for op in schedule:
            if op[0] == "filters" and op[1] == "f1" and filters1:
                extras_cb.append(_make_learn(("filters", "f1")))
            elif op[0] == "probe":
                extras_cb.append(_make_learn(_stage_id(op[1])))

    # ---- probe-result caching -------------------------------------------
    # The probe mapping (probe row → build row) is a pure function of the
    # base table and the build subtree — NOT of the probe-side filters —
    # so it is cached on the join node keyed by both version keys, exactly
    # like the build-prep cache. A warm query skips the probe gather (the
    # dominant surviving cost of join-heavy queries: 6M-row LUT gathers
    # are latency-bound at ~7 ns/row, PERF.md). This is the persistent
    # FK-join-index analog of the reference's BuildPrefixRangeFilter
    # pushdown (join_hashtable.cpp:1011): instead of filtering probe rows
    # per query, the whole mapping persists until either side changes.
    step2join = dict(zip(map(id, join_steps), join_nodes))
    base_ver = (base.table, entry.nrows, getattr(entry, "version", 0))
    array_extras_cb: List[Callable] = []
    cached_flags = []
    compacted = False
    PROBE_CACHE_MAX = 1 << 27
    # chunked execution substitutes per-chunk table views (scan
    # overrides): the base is then a CHUNK, not the version-keyed table —
    # never cache or consume probe mappings there
    overridden = bool(getattr(executor, "_scan_overrides", None))
    for op in schedule:
        if op[0] == "compact":
            compacted = True
        if op[0] != "probe":
            continue
        step = op[1]
        j = step2join[id(step)]
        step.use_cached = False
        step.emit_cache = False
        vkey = getattr(step, "vkey", None)
        if vkey is None or plen > PROBE_CACHE_MAX or overridden:
            cached_flags.append(False)
            continue
        ckey = (vkey, base_ver)
        bc = _cache_store(j, "_bidx_cache")
        cached = bc.get(ckey)
        if cached is not None and cached.shape[0] == plen:
            step.use_cached = True
            aux[f"{step.pfx}.cbidx"] = cached
        elif not compacted:
            # probe runs at full base length → its bidx is cacheable
            step.emit_cache = True

            def _store(arr, j=j, ckey=ckey):
                cache = _cache_store(j, "_bidx_cache")
                cache.clear()
                cache[ckey] = arr

            array_extras_cb.append(_store)
        cached_flags.append(step.use_cached)

    from duckdb_tpu.execution.tracing import TraceEnv

    class _LazyBaseCol:
        """Post-compaction base column: one gather from the ORIGINAL plane
        through the composed row selection, evaluated only on access."""

        def __init__(self, col, sel):
            self.col = col
            self.sel = sel

        def eval(self, env):
            c, sel = self.col, self.sel
            return Column(
                data=jnp.broadcast_to(c.data, (plen,))[sel], ltype=c.ltype,
                validity=(jnp.broadcast_to(c.validity, (plen,))[sel]
                          if c.validity is not None else None),
                dict_values=c.dict_values,
                data_hi=(jnp.broadcast_to(c.data_hi, (plen,))[sel]
                         if c.data_hi is not None else None))

    def run_pipeline(env):
        """Execute the staged schedule → (env2, live, p, extras)."""
        p = plen
        live = env.live
        env2 = TraceEnv({k: env[k] for k in needed}, p, live,
                        overlay=dict(proj_list))
        env2.aux = env.aux
        sel = None  # composed selection into the original frame
        bidx_map = {}
        extras = []
        arr_extras = []
        for op in schedule:
            if op[0] == "filters":
                fs = filters1 if op[1] == "f1" else filters2
                for f in fs:
                    c = f.eval(env2)
                    keep = jnp.broadcast_to(c.data.astype(jnp.bool_), (p,))
                    if c.validity is not None:
                        keep = jnp.logical_and(
                            keep, jnp.broadcast_to(c.validity, (p,)))
                    live = jnp.logical_and(live, keep)
                    env2.live = live
                if op[1] == "f1" and allow_compact and filters1:
                    extras.append(jnp.sum(live))
            elif op[0] == "probe":
                step = op[1]
                jt = getattr(step, "jtype", "inner")
                if getattr(step, "use_cached", False):
                    # cached probe mapping: -1 marks miss/NULL-key rows
                    bfull = env2.aux[f"{step.pfx}.cbidx"]
                    bidx = bfull if sel is None else bfull[sel]
                    found = bidx >= 0
                    hit = jnp.logical_and(live, found)
                    bidx = jnp.clip(bidx, 0, step.build_plen - 1)
                else:
                    bidx, hit, found = step.probe(env2, p, live)
                    if getattr(step, "emit_cache", False):
                        arr_extras.append(
                            jnp.where(found, bidx, jnp.int32(-1)))
                if step.extra is not None:
                    found = _extra_found(step, env2, p, bidx, found)
                if jt == "anti":
                    live = jnp.logical_and(live, jnp.logical_not(found))
                else:  # inner and semi both keep matching rows
                    live = jnp.logical_and(live, found)
                env2.live = live
                if jt == "inner":
                    bidx_map[step] = bidx
                    step.register_lazy(env2, bidx)
                if allow_compact:
                    extras.append(jnp.sum(live))
            else:  # compact
                cap = op[1]
                idx, live = compact_indices(live, cap)
                sel = idx if sel is None else sel[idx]
                env2 = TraceEnv({}, cap, live, overlay=dict(proj_list))
                env2.aux = env.aux
                for k in needed:
                    env2._overlay[k] = _LazyBaseCol(env[k], sel)
                for st, b in list(bidx_map.items()):
                    b2 = b[idx]
                    bidx_map[st] = b2
                    st.register_lazy(env2, b2)
                p = cap
        return env2, live, p, tuple(extras) + tuple(arr_extras)

    def run_phase1(env, p):
        """→ (env2, live, phase1 bidx per step) at full length. Build
        columns register as lazy gathers — a column nothing reads before
        compaction never enters the trace at full length."""
        live = env.live
        env2 = TraceEnv({k: env[k] for k in needed}, p, live,
                        overlay=dict(proj_list))
        env2.aux = env.aux
        bidx1 = []
        for f in filters1:
            c = f.eval(env2)
            keep = jnp.broadcast_to(c.data.astype(jnp.bool_), (p,))
            if c.validity is not None:
                keep = jnp.logical_and(keep,
                                       jnp.broadcast_to(c.validity, (p,)))
            live = jnp.logical_and(live, keep)
            env2.live = live
        for step in phase1_steps:
            bidx, hit, found = step.probe(env2, p, live)
            jt = getattr(step, "jtype", "inner")
            if step.extra is not None:
                found = _extra_found(step, env2, p, bidx, found)
            if jt == "anti":
                live = jnp.logical_and(live, jnp.logical_not(found))
            else:
                live = jnp.logical_and(live, found)
            env2.live = live
            bidx1.append(bidx)
            if jt == "inner":
                step.register_lazy(env2, bidx)
        return env2, live, bidx1

    def run_phase2(env2, p, live):
        """Probes + filters after compaction; returns final live."""
        for step in phase2_steps:
            bidx, hit, found = step.probe(env2, p, live)
            jt = getattr(step, "jtype", "inner")
            if step.extra is not None:
                found = _extra_found(step, env2, p, bidx, found)
            if jt == "anti":
                live = jnp.logical_and(live, jnp.logical_not(found))
            else:
                live = jnp.logical_and(live, found)
            env2.live = live
            if jt == "inner":
                step.register_lazy(env2, bidx)
        for f in filters2:
            c = f.eval(env2)
            keep = jnp.broadcast_to(c.data.astype(jnp.bool_), (p,))
            if c.validity is not None:
                keep = jnp.logical_and(keep,
                                       jnp.broadcast_to(c.validity, (p,)))
            live = jnp.logical_and(live, keep)
            env2.live = live
        return live

    def agg_partial_vectors(env, live, p):
        vecs, kinds = [], []
        for agg in node.aggs:
            for vec, kind in _slot_agg_partial_vectors(agg, env, live, p):
                vecs.append(vec)
                kinds.append(kind)
        return vecs, kinds

    def dense_ids(env, live, p):
        # group-slot arithmetic is pure int32: total <= PERFECT_LIMIT
        # (2^23) by construction, and int64 is x64-emulated on TPU
        dense = jnp.zeros((p,), jnp.int32)
        for (gkey, ge), lo, dom in zip(group_resolved, mins, domains):
            c = ge.eval(env)
            kd = jnp.broadcast_to(c.data, (p,))
            if kd.dtype.itemsize >= 8:
                off = jnp.clip(kd - kd.dtype.type(lo) + 1, 0,
                               dom - 1).astype(jnp.int32)
            elif -(2 ** 31) <= lo < 2 ** 31 - 1:
                off = jnp.clip(kd.astype(jnp.int32) - jnp.int32(lo)
                               + jnp.int32(1), 0, dom - 1)
            else:
                off = jnp.clip(kd.astype(jnp.int64) - lo + 1, 0,
                               dom - 1).astype(jnp.int32)
            if c.validity is not None:
                off = jnp.where(jnp.broadcast_to(c.validity, (p,)), off, 0)
            dense = dense * jnp.int32(dom) + off
        return jnp.where(live, dense, total)

    def dense_reduce(env, live, p):
        from duckdb_tpu.ops.grouped import grouped_reduce

        dense = dense_ids(env, live, p)
        vecs, kinds = agg_partial_vectors(env, live, p)
        vecs.append(live.astype(jnp.int32))
        kinds.append("sum")
        res = grouped_reduce(dense, vecs, kinds, total)
        return res[:-1], res[-1].astype(jnp.int32)

    def dense_finalize(occ, flat):
        """Replicated epilogue: decode group keys, finalize aggregates."""
        if not node.groups:
            # ungrouped aggregate: exactly one output row, live even when
            # no input rows matched (SQL scalar-aggregate semantics)
            occ = jnp.maximum(occ, 1)
        cols: Dict[str, Column] = {}
        slots = jnp.arange(total, dtype=jnp.int64)
        for (gkey, ge), lo, dom, st in zip(group_resolved, mins, domains,
                                           strides):
            t, dvals = out_types[gkey]
            comp = (slots // jnp.int64(st)) % jnp.int64(dom)
            validity = jnp.logical_and(comp > 0, occ > 0)
            vals = (comp - 1 + jnp.int64(lo))
            if not t.is_float:
                vals = vals.astype(t.np_dtype)
            cols[gkey] = Column(data=vals, ltype=t, validity=validity,
                                dict_values=dvals)
        i = 0
        for agg, kinds, at in zip(node.aggs, partial_kinds, arg_types):
            parts = flat[i:i + len(kinds)]
            i += len(kinds)
            data, valid = _slot_agg_finalize(agg, parts, at)
            if isinstance(data, tuple):  # wide sum: (low64, hi64)
                cols[agg.key] = Column(data=data[0], ltype=agg.ltype,
                                       validity=valid, data_hi=data[1])
            else:
                cols[agg.key] = Column(data=data, ltype=agg.ltype,
                                       validity=valid)
        return cols, occ

    def sort_group_reduce(env, live, p):
        """In-trace sort-group at the compacted length → (cols, occ)."""
        from duckdb_tpu.execution.aggregate_exec import (_key_data, _seg_sum)

        key_cols = [ge.eval(env) for _, ge in group_resolved]
        operands = [jnp.logical_not(live)]
        # bounded keys pack multiplicatively into 62-bit words (NULL takes
        # the top slot of each digit, preserving the flag-then-value
        # order); unbounded keys keep their own (nullflag, value) pair
        word = None
        word_dom = 1

        def _flush():
            nonlocal word, word_dom
            if word is not None:
                operands.append(word)
                word = None
                word_dom = 1

        for c, b in zip(key_cols, sort_key_bounds):
            kv = (jnp.broadcast_to(c.validity, (p,))
                  if c.validity is not None else jnp.ones((p,), jnp.bool_))
            kd = _key_data(c, p)
            if b is not None:
                lo, rng = int(b[0]), int(b[1] - b[0] + 1)
                dom = rng + 1  # +1: NULL slot sorts after every value
                if word_dom * dom > (1 << 62):
                    _flush()
                digit = jnp.where(
                    kv, jnp.clip(kd - jnp.int64(lo), 0, rng - 1),
                    jnp.int64(rng))
                word = digit if word is None \
                    else word * jnp.int64(dom) + digit
                word_dom *= dom
            else:
                _flush()
                operands.append(jnp.logical_not(kv))
                operands.append(jnp.where(kv, kd, 0))
        _flush()
        iota = jnp.arange(p, dtype=jnp.int32)
        operands.append(iota)
        out = jax.lax.sort(operands, num_keys=len(operands) - 1,
                           is_stable=False)
        dead_s = out[0]
        perm = out[-1]
        ks = out[1:-1]
        change = jnp.zeros((p,), jnp.bool_)
        for k in ks:
            change = jnp.logical_or(change, k != jnp.roll(k, 1))
        change = change.at[0].set(True)
        change = jnp.logical_and(change, jnp.logical_not(dead_s))
        change = change.at[0].set(jnp.logical_not(dead_s[0]))
        gid_sorted = jnp.cumsum(change.astype(jnp.int32)) - 1
        gid_sorted = jnp.where(dead_s, out_cap, gid_sorted)
        gids = jnp.zeros((p,), jnp.int32).at[perm].set(gid_sorted)
        nseg = out_cap + 1
        # representative rows → group key output columns
        first_pos = jax.ops.segment_min(iota, gid_sorted,
                                        num_segments=nseg)[:out_cap]
        rep_rows = perm[jnp.clip(first_pos, 0, p - 1)]
        cols: Dict[str, Column] = {}
        occ = _seg_sum(live.astype(jnp.int32), gids,
                       num_segments=nseg)[:out_cap].astype(jnp.int32)
        for (gkey, ge), c in zip(group_resolved, key_cols):
            data = jnp.broadcast_to(c.data, (p,))[rep_rows]
            validity = (jnp.broadcast_to(c.validity, (p,))[rep_rows]
                        if c.validity is not None else None)
            if validity is not None:
                validity = jnp.logical_and(validity, occ > 0)
            cols[gkey] = Column(data=data, ltype=c.ltype, validity=validity,
                                dict_values=c.dict_values)
        vecs, kinds_flat = agg_partial_vectors(env, live, p)
        flat = []
        for vec, kind in zip(vecs, kinds_flat):
            if kind == "sum":
                flat.append(_seg_sum(vec, gids, num_segments=nseg)[:out_cap])
            elif kind == "min":
                flat.append(jax.ops.segment_min(
                    vec, gids, num_segments=nseg)[:out_cap])
            else:
                flat.append(jax.ops.segment_max(
                    vec, gids, num_segments=nseg)[:out_cap])
        i = 0
        for agg, kinds, at in zip(node.aggs, partial_kinds, arg_types):
            parts = flat[i:i + len(kinds)]
            i += len(kinds)
            data, valid = _slot_agg_finalize(agg, parts, at)
            if isinstance(data, tuple):
                cols[agg.key] = Column(data=data[0], ltype=agg.ltype,
                                       validity=valid, data_hi=data[1])
            else:
                cols[agg.key] = Column(data=data, ltype=agg.ltype,
                                       validity=valid)
        return cols, occ

    def body(env):
        """Single-chip fused pipeline → (cols, occ, extras)."""
        env2, live, p, extras = run_pipeline(env)
        if dense_mode:
            flat, occ = dense_reduce(env2, live, p)
            cols, occ = dense_finalize(occ, flat)
        else:
            cols, occ = sort_group_reduce(env2, live, p)
        return cols, occ, extras

    # distributed split (dense only): per-shard partials + replicated
    # finalize; no compaction (shards are already 1/n of the block)
    def body_partials(env, shard_plen=None):
        p = shard_plen if shard_plen is not None else plen
        env2, live, bidx1 = run_phase1(env, p)
        live = run_phase2(env2, p, live)
        return_occ_flat = dense_reduce(env2, live, p)
        flat, occ = return_occ_flat
        return occ, flat

    fa = FusedAgg(base_batch, needed, body, out_cap, out_types, aux,
                  extras_cb, dense_mode,
                  body_partials=body_partials if dense_mode else None,
                  finalize=dense_finalize if dense_mode else None,
                  partial_kinds=partial_kinds,
                  variant=(dense_mode, out_cap, tuple(cached_flags),
                           tuple((op[0], op[1]) if op[0] != "probe"
                                 else ("probe", join_steps.index(op[1]))
                                 for op in schedule),
                           # grouping bounds are BAKED into the traced
                           # body as Python ints; chunked execution runs
                           # the same node over per-chunk table views
                           # whose stats differ — without these in the
                           # cache key, chunk 2 reused chunk 1's program
                           # and clamped its keys into chunk 1's domain
                           # (measured: half the groups collapsed)
                           tuple(mins), tuple(domains),
                           tuple(sort_key_bounds)),
                  array_extras_cb=array_extras_cb)
    return fa


def try_fused_aggregate(executor, node: P.Aggregate):
    """Standalone fused aggregate → Batch (or None)."""
    from duckdb_tpu.execution.executor import Batch, DictCols
    from duckdb_tpu.execution.tracing import run_jitted

    fa = build_fused_agg(executor, node)
    if fa is None:
        return None

    keyrefs = [B.BoundColumnRef(k, fa.base_batch.src[k].ltype)
               for k in fa.needed]

    n_shards = _num_shards(executor, fa)
    if n_shards > 1:
        occ, flat = _run_sharded(executor, node, fa, n_shards)
        # land the replicated mesh outputs on the default device: the
        # eager tail (compaction, gathers) is single-device, and mixing
        # mesh-resident with device-committed arrays is an error (and
        # each eager op on a mesh array re-enters GSPMD)
        from duckdb_tpu.execution.executor import _unshard
        occ = _unshard(occ)
        flat = [tuple(None if a is None else _unshard(a) for a in t)
                for t in flat]
    else:
        def jit_body(env):
            cols, occ, extras = fa.body(env)
            flat = [(cols[k].data, cols[k].data_hi, cols[k].validity)
                    for k in sorted(cols)]
            return occ, flat, extras

        occ, flat, extras = run_jitted(node, "agg", fa.base_batch, keyrefs,
                                       jit_body, aux=fa.aux,
                                       variant=fa.variant)
        n_sc = len(fa.extras_cb)
        for e, cb in zip(extras[:n_sc], fa.extras_cb):
            executor.defer_scalar(e, cb)
        for e, cb in zip(extras[n_sc:], fa.array_extras_cb):
            cb(e)  # device array (probe-cache store): no host sync
    names = sorted(fa.out_types)
    # group count stays a DEVICE scalar: capacity is learned across runs and
    # verified via the deferred-scalar channel (rerun on overflow) — no
    # mid-query host sync (see executor.defer_scalar)
    n_groups = jnp.sum(occ > 0)
    learned = getattr(node, "_last_n_groups", None)
    bound = fa.total if learned is None else min(fa.total,
                                                 int(learned * 5 // 4) + 1)
    out_plen = max(128, pad_bucket(min(bound, fa.base_batch.plen)))

    def _learn_groups(v, node=node, out_plen=out_plen):
        node._last_n_groups = int(v)
        return int(v) > out_plen

    executor.defer_scalar(n_groups, _learn_groups)
    slot_idx, _ = compact_indices(occ > 0, out_plen)
    out_live = jnp.arange(out_plen) < n_groups
    cols = {}
    for k, (data, data_hi, valid) in zip(names, flat):
        t, dvals = fa.out_types[k]
        d = data[slot_idx]
        dh = data_hi[slot_idx] if data_hi is not None else None
        v = valid[slot_idx] if valid is not None else None
        if v is not None:
            v = jnp.where(out_live, v, False)
        cols[k] = Column(data=d, ltype=t, validity=v, dict_values=dvals,
                         data_hi=dh)
    return Batch(src=DictCols(cols), plen=out_plen, live=out_live)


def _num_shards(executor, fa) -> int:
    import jax

    n = executor._join_shards(rows=fa.base_batch.plen)
    if n <= 1:
        return 1
    if not fa.dense:
        executor._log("WARN", "sharding",
                      "fused aggregate without static group bounds: "
                      "sort-group partials are shard-local; aggregate "
                      "runs single-chip")
        return 1
    if len(jax.devices()) < n:
        executor._log("WARN", "sharding",
                      f"num_shards={n} requested but only "
                      f"{len(jax.devices())} devices visible; aggregate "
                      "runs single-chip")
        return 1
    if fa.base_batch.plen % n != 0:
        executor._log("WARN", "sharding",
                      f"num_shards={n}: padded block {fa.base_batch.plen} "
                      "not divisible by shard count; aggregate runs "
                      "single-chip")
        return 1
    return n


def _run_sharded(executor, node, fa: FusedAgg, n: int):
    """Distributed fused aggregate: shard_map over an n-device mesh.

    Row-sharded scan columns; join build state (LUTs / sorted key tables /
    build column planes) rides REPLICATED — the reference's broadcast
    exchange (src/parallel/pipeline_broadcast_exchange.cpp) as a
    replicated sharding. Each chip runs the identical partial program on
    its shard; psum/pmin/pmax collectives merge the dense slot partials
    (the reference's Sink→Combine contract as ICI collectives); the
    replicated finalize runs once. This is the morsel-driven parallelism
    table from SURVEY §2.3 realized: morsel cursor → static row sharding,
    thread-local HT → per-chip dense partials, Combine → psum.
    """
    import jax
    from jax.sharding import Mesh, PartitionSpec as PS

    from duckdb_tpu.parallel.shard import shard_map_compat

    from duckdb_tpu.blocks import Column
    from duckdb_tpu.execution.tracing import TraceEnv

    batch = fa.base_batch
    plen = batch.plen
    cols = {k: batch.src[k] for k in fa.needed}
    cache = _cache_store(node, "_shard_cache")
    # probe-result caches (.cbidx) are probe-length and single-chip-only
    # (body_partials recomputes probes per shard); don't replicate them
    aux_names = tuple(n for n in sorted(fa.aux) if not n.endswith(".cbidx"))
    sig = (n, plen, tuple(fa.needed),
           tuple((nm, fa.aux[nm].shape) for nm in aux_names))
    if sig not in cache:
        mesh = Mesh(np.array(jax.devices()[:n]), ("dp",))
        templates = dict(cols)
        keys = list(fa.needed)
        kinds_flat = [k for ks in fa.partial_kinds for k in ks]

        def shard_fn(live, aux_vals, *arrays):
            tcols = {}
            for i, k in enumerate(keys):
                t = templates[k]
                validity = arrays[2 * i + 1]
                tcols[k] = Column(
                    data=arrays[2 * i], ltype=t.ltype,
                    validity=None if validity.shape[0] == 0 else validity,
                    dict_values=t.dict_values)
            shard_plen = plen // n
            env = TraceEnv(tcols, shard_plen, live)
            env.aux = dict(zip(aux_names, aux_vals))
            occ, flat = fa.body_partials(env, shard_plen=shard_plen)
            occ = jax.lax.psum(occ, "dp")
            out = []
            for arr, kind in zip(flat, kinds_flat):
                if kind == "sum":
                    out.append(jax.lax.psum(arr, "dp"))
                elif kind == "min":
                    out.append(jax.lax.pmin(arr, "dp"))
                else:
                    out.append(jax.lax.pmax(arr, "dp"))
            return occ, out

        # validity placeholders (shape (0,)) and aux stay replicated
        def spec_for(arr_shape):
            return PS("dp") if arr_shape[0] == plen else PS()

        arrays0 = []
        for k in keys:
            c = cols[k]
            arrays0.append(c.data)
            arrays0.append(c.validity if c.validity is not None
                           else _empty_bool())
        specs = tuple([PS("dp"), tuple(PS() for _ in aux_names)]
                      + [spec_for(a.shape) for a in arrays0])
        mapped = shard_map_compat(shard_fn, mesh, specs, (PS(), PS()))

        def program(live, aux_vals, *arrays):
            occ, flat = mapped(live, aux_vals, *arrays)
            cols2, occ2 = fa.finalize(occ, flat)
            flat2 = [(cols2[k].data, cols2[k].data_hi, cols2[k].validity)
                     for k in sorted(cols2)]
            return occ2, flat2

        cache[sig] = jax.jit(program)
    fn = cache[sig]
    # inputs may arrive committed to a single device by earlier eager
    # stages; shard_map-in-jit rejects mixed placements, so place every
    # operand on the mesh explicitly (row-sharded when full-length,
    # replicated otherwise)
    from jax.sharding import NamedSharding

    mesh2 = Mesh(np.array(jax.devices()[:n]), ("dp",))

    def put(a, sharded):
        return jax.device_put(a, NamedSharding(
            mesh2, PS("dp") if sharded else PS()))

    arrays = []
    for k in fa.needed:
        c = cols[k]
        arrays.append(put(c.data, c.data.shape[0] == plen))
        v = c.validity if c.validity is not None else _empty_bool()
        arrays.append(put(v, v.shape[0] == plen))
    live_in = put(batch.live, True)
    aux_in = tuple(put(fa.aux[nm], False) for nm in aux_names)
    return fn(live_in, aux_in, *arrays)


def _slot_agg_partial_vectors(agg, env, live, plen):
    """Pre-scatter per-row vectors + combine kinds (scatters batched by the
    caller into one 2D segment_sum)."""
    if agg.func == "count_star":
        return [(live.astype(jnp.int64), "sum")]
    c = agg.args[0].eval(env)
    data = jnp.broadcast_to(c.data, (plen,))
    mask = live
    if c.validity is not None:
        mask = jnp.logical_and(mask, jnp.broadcast_to(c.validity, (plen,)))
    cnt_vec = mask.astype(jnp.int64)
    if agg.func == "count":
        return [(cnt_vec, "sum")]
    if agg.func in ("sum", "avg", "mean"):
        if c.ltype.is_float:
            return [(jnp.where(mask, data.astype(jnp.float64), 0.0), "sum"),
                    (cnt_vec, "sum")]
        x = jnp.where(mask, data.astype(jnp.int64), 0)
        if (agg.func == "sum" and getattr(agg, "_wide", False)
                and (c.ltype.is_integer
                     or c.ltype.id is TypeId.HUGEINT
                     or (c.ltype.id is TypeId.DECIMAL
                         and agg.ltype.width > 18))):
            mask32 = jnp.int64((1 << 32) - 1)
            return [(x >> 32, "sum"), (x & mask32, "sum"), (cnt_vec, "sum")]
        return [(x, "sum"), (cnt_vec, "sum")]
    if agg.func in ("min", "max"):
        if c.ltype.is_float:
            sent = jnp.inf if agg.func == "min" else -jnp.inf
            x = jnp.where(mask, data.astype(jnp.float64), sent)
        else:
            sent = (np.iinfo(np.int64).max if agg.func == "min"
                    else np.iinfo(np.int64).min)
            x = jnp.where(mask, data.astype(jnp.int64), sent)
        return [(x, agg.func), (cnt_vec, "sum")]
    raise AssertionError(agg.func)


def _slot_agg_finalize(agg, parts, arg_type):
    """Combined partials → (data, validity|None)."""
    if agg.func in ("count_star", "count"):
        return (parts[0], None)
    if agg.func == "sum" and len(parts) == 3:
        hi32, lo, cnt = parts
        nonempty = cnt > 0
        # value = hi32·2^32 + lo exactly; split into (hi64, low64) planes
        mask32 = jnp.int64((1 << 32) - 1)
        mid = hi32 + (lo >> 32)
        low64 = ((mid & mask32) << 32) | (lo & mask32)
        hi64 = mid >> 32
        return ((low64, hi64), nonempty)
    cnt = parts[1]
    nonempty = cnt > 0
    if agg.func == "sum":
        return (parts[0], nonempty)
    if agg.func in ("avg", "mean"):
        s = parts[0]
        if arg_type.id is TypeId.DECIMAL:
            divident = cnt.astype(jnp.float64) * jnp.float64(
                10.0 ** arg_type.scale)
            return (s.astype(jnp.float64) / divident, nonempty)
        if arg_type.is_float:
            return (s / cnt.astype(jnp.float64), nonempty)
        return (s.astype(jnp.float64) / cnt.astype(jnp.float64), nonempty)
    if agg.func in ("min", "max"):
        return (parts[0].astype(arg_type.np_dtype), nonempty)
    raise AssertionError(agg.func)


def _arg_type(agg, env):
    if agg.args:
        return agg.args[0].eval(env).ltype
    return BIGINT
