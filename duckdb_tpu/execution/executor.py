"""Plan executor: whole-block XLA programs over padded columnar batches.

Replaces the reference's pull/push pipeline interpreter
(/root/reference/src/parallel/pipeline_executor.cpp,
src/execution/physical_operator.cpp) with host-driven execution of plan
nodes, where each node's work is a handful of fused jnp/XLA ops over an
entire padded block. The only host syncs are *cardinality* syncs at
pipeline boundaries (filter compaction, join expansion size, group count)
— the TPU analog of duckdb's HAVE_MORE_OUTPUT re-entry, with pad-bucketed
sizes so repeated queries hit the jit/dispatch cache.

Late materialization is structural: a Batch's columns are lazy; a join
stores gather indices and only materializes the planes downstream ops
touch (duckdb gets this via its late-materialization optimizer rule,
src/optimizer/late_materialization.cpp — here it falls out of the design).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_tpu.blocks import Column, pad_bucket
from duckdb_tpu.catalog.catalog import Catalog, TableEntry
from duckdb_tpu.ops import join as J
from duckdb_tpu.ops import sort as S
from duckdb_tpu.ops.compact import compact_indices
from duckdb_tpu.planner import plan as P
from duckdb_tpu.planner import bound as B
from duckdb_tpu.planner.bound import BoundAggregate, EvalEnv, _to_double
from duckdb_tpu.types import (
    BIGINT,
    BOOLEAN,
    DOUBLE,
    LogicalType,
    TypeId,
)

_I64_MIN = int(np.iinfo(np.int64).min)
_I64_MAX = int(np.iinfo(np.int64).max)


def _unshard(*arrays):
    """Copy mesh-sharded collective outputs onto the default device.

    Downstream operators run single-device eager ops; an eager op over an
    N-device sharded array re-enters GSPMD per op (measured: multi-minute
    stalls and outright deadlocks on the CPU backend). One explicit
    device_put per array replaces all of that with a single copy.
    """
    d0 = jax.devices()[0]
    out = tuple(jax.device_put(a, d0) for a in arrays)
    return out if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# lazy column sources
class ColSource:
    def __getitem__(self, key: str) -> Column:
        raise KeyError(key)

    def __contains__(self, key: str) -> bool:
        try:
            self[key]
            return True
        except KeyError:
            return False

    def stats_range(self, key: str):
        """(min, max) value bounds for an integer-physical column, or None.

        Bounds survive filters/gathers (they only shrink the value set) —
        the zone-map idea from the reference (src/storage/statistics/)
        reused to size perfect-hash join tables without device syncs.
        """
        return None


class TableCols(ColSource):
    def __init__(self, entry: TableEntry, keymap: Dict[str, str], plen: int):
        self.entry = entry
        self.keymap = keymap  # key → column name
        self.plen = plen

    def __getitem__(self, key: str) -> Column:
        col = self.entry.device_column(self.keymap[key])
        assert col.padded_len == self.plen
        return col

    def stats_range(self, key: str):
        if key not in self.keymap:
            return None
        col_name = self.keymap[key]
        t = self.entry.col_types[col_name]
        if t.id is TypeId.VARCHAR:
            _, _, dvals = self.entry.host_column(col_name)
            return (0, max(0, len(dvals) - 1)) if dvals is not None else None
        if not (t.is_integer or t.id.name in ("DATE", "DECIMAL", "BOOLEAN")):
            return None
        st = self.entry.stats_for(col_name)
        if st.min_val is None or st.max_val is None:
            return None
        return (int(st.min_val), int(st.max_val))


class DictCols(ColSource):
    def __init__(self, cols: Dict[str, Column]):
        self.cols = cols

    def __getitem__(self, key: str) -> Column:
        return self.cols[key]

    def stats_range(self, key: str):
        return None


class ChainCols(ColSource):
    """Lookup through a list of sources (join output: probe ∪ build)."""

    def __init__(self, sources: List[ColSource]):
        self.sources = sources

    def __getitem__(self, key: str) -> Column:
        for s in self.sources:
            try:
                return s[key]
            except KeyError:
                continue
        raise KeyError(key)

    def stats_range(self, key: str):
        for s in self.sources:
            if key in s:
                return s.stats_range(key)
        return None


class GatherCols(ColSource):
    """Late materialization: parent columns gathered by row indices on access."""

    def __init__(self, parent: ColSource, rows: jnp.ndarray,
                 null_rows: Optional[jnp.ndarray] = None):
        self.parent = parent
        self.rows = rows  # (P',) int32 indices into parent block; may be -1
        self.null_rows = null_rows  # bool (P',): True → row is NULL (outer join)
        self._cache: Dict[str, Column] = {}

    def __getitem__(self, key: str) -> Column:
        if key in self._cache:
            return self._cache[key]
        col = self.parent[key]
        idx = jnp.clip(self.rows, 0, col.data.shape[0] - 1)
        data = col.data[idx]
        validity = col.validity[idx] if col.validity is not None else None
        if self.null_rows is not None:
            base = jnp.ones(self.rows.shape, jnp.bool_) if validity is None else validity
            validity = jnp.logical_and(base, jnp.logical_not(self.null_rows))
        data_hi = col.data_hi[idx] if col.data_hi is not None else None
        out = Column(data=data, ltype=col.ltype, validity=validity,
                     dict_values=col.dict_values, data_hi=data_hi)
        self._cache[key] = out
        return out

    def stats_range(self, key: str):
        return self.parent.stats_range(key)


def gather_source(src: ColSource, idx: jnp.ndarray) -> ColSource:
    """Compose a row selection into a lazy source WITHOUT materializing
    parent-length columns: gather(gather(T, brow), idx) = gather(T,
    brow[idx]). This is the engine's late materialization — a filter that
    keeps 0.5% of a 6M-row join output shrinks every downstream build-column
    gather from O(6M) to O(live) (reference analog: SelectionVector
    chaining through DataChunk slices)."""
    if isinstance(src, GatherCols):
        rows = src.rows[jnp.clip(idx, 0, src.rows.shape[0] - 1)]
        nulls = (src.null_rows[jnp.clip(idx, 0, src.null_rows.shape[0] - 1)]
                 if src.null_rows is not None else None)
        return GatherCols(src.parent, rows, nulls)
    if isinstance(src, ChainCols):
        return ChainCols([gather_source(s, idx) for s in src.sources])
    return GatherCols(src, idx)


@dataclass
class Batch:
    src: ColSource
    plen: int
    live: jnp.ndarray  # (P,) bool
    # True only for an unfiltered base-table scan: its live mask and key
    # columns are deterministic given (table, version), so join build state
    # over it may be cached on the TableEntry
    pristine: bool = False

    def env(self) -> EvalEnv:
        return EvalEnv(cols=self.src, plen=self.plen, live=self.live)

    def count_live(self) -> int:
        return int(jnp.sum(self.live))


def _full_valid(c: Column, plen: int) -> jnp.ndarray:
    if c.validity is None:
        return jnp.ones((plen,), jnp.bool_)
    return jnp.broadcast_to(c.validity, (plen,))


def _bdata(c: Column, plen: int) -> jnp.ndarray:
    return jnp.broadcast_to(c.data, (plen,))


# ---------------------------------------------------------------------------
@dataclass
class Result:
    names: List[str]
    types: List[LogicalType]
    columns: List[Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]]
    # per column: (values, validity|None, dict_values|None) — already compacted
    nrows: int

    def df(self):
        """pandas DataFrame (duckdb python API parity: res.df())."""
        import pandas as pd

        return pd.DataFrame(self.rows(), columns=self.names)

    def fetchall(self):
        return self.rows()

    def fetchone(self):
        r = self.rows()
        return r[0] if r else None

    def arrow(self):
        """pyarrow Table over the host planes — no row materialization
        (duckdb python API parity: res.arrow(); reference:
        src/common/arrow/arrow_converter.cpp)."""
        from duckdb_tpu.api.arrow_interop import result_to_arrow

        return result_to_arrow(self)

    fetch_arrow_table = arrow

    def fetch_record_batch(self, rows_per_batch: int = 1_000_000):
        """Streaming pyarrow.RecordBatchReader (python API parity)."""
        from duckdb_tpu.api.arrow_interop import result_record_batch_reader

        return result_record_batch_reader(self, rows_per_batch)

    record_batch = fetch_record_batch
    fetch_arrow_reader = fetch_record_batch

    def fetchnumpy(self):
        """{name: np.ndarray} (duckdb python API parity)."""
        rows = self.rows()
        return {name: np.array([r[i] for r in rows])
                for i, name in enumerate(self.names)}

    def rows(self) -> List[tuple]:
        """Python-value rows (DECIMAL → decimal.Decimal, DATE → datetime.date)."""
        import datetime
        import decimal as pydec

        pycols = []
        for (vals, valid, dvals), t in zip(self.columns, self.types):
            out = []
            for i in range(self.nrows):
                if valid is not None and not valid[i]:
                    out.append(None)
                    continue
                v = vals[i]
                if t.id is TypeId.VARCHAR:
                    out.append(str(dvals[v]))
                elif t.id is TypeId.BIT:
                    out.append(str(dvals[v]))
                elif t.id in (TypeId.LIST, TypeId.ARRAY):
                    out.append(list(dvals[v]))
                elif t.id is TypeId.UNION:
                    out.append(dvals[v][1])  # (tag, value) → the value
                elif t.id is TypeId.TIMESTAMPTZ:
                    out.append((datetime.datetime(
                        1970, 1, 1, tzinfo=datetime.timezone.utc)
                        + datetime.timedelta(microseconds=int(v))))
                elif t.id is TypeId.MAP:
                    out.append(dict(dvals[v]))
                elif t.id is TypeId.STRUCT:
                    names = [n for n, _ in (t.fields or ())]
                    out.append(dict(zip(names, dvals[v])))
                elif t.id is TypeId.DECIMAL:
                    out.append(pydec.Decimal(int(v)).scaleb(-t.scale))
                elif t.id is TypeId.HUGEINT:
                    out.append(int(v))
                elif t.id is TypeId.INTERVAL:
                    out.append(datetime.timedelta(microseconds=int(v)))
                elif t.id is TypeId.BLOB:
                    b = dvals[v]
                    out.append(bytes(b) if not isinstance(b, str)
                               else b.encode())
                elif t.id is TypeId.DATE:
                    out.append(datetime.date(1970, 1, 1)
                               + datetime.timedelta(days=int(v)))
                elif t.id is TypeId.TIMESTAMP:
                    out.append(datetime.datetime(1970, 1, 1)
                               + datetime.timedelta(microseconds=int(v)))
                elif t.id is TypeId.TIME:
                    us = int(v)
                    out.append(datetime.time(us // 3_600_000_000,
                                             us // 60_000_000 % 60,
                                             us // 1_000_000 % 60,
                                             us % 1_000_000))
                elif t.id is TypeId.BOOLEAN:
                    out.append(bool(v))
                elif t.is_float:
                    out.append(float(v))
                else:
                    out.append(int(v))
            pycols.append(out)
        return [tuple(c[i] for c in pycols) for i in range(self.nrows)]


class Executor:
    def __init__(self, catalog: Catalog, scalar_sub_results: Optional[dict] = None):
        self.catalog = catalog
        self._deferred = []

    def _get_table(self, name: str):
        """Table resolution with per-run overrides — the out-of-core driver
        (execution/chunked.py) substitutes row-sliced TableEntry views."""
        ov = getattr(self, "_scan_overrides", None)
        if ov is not None and name in ov:
            return ov[name]
        return self.catalog.get_table(name)

    # -- deferred scalars ------------------------------------------------------
    # Speculative sizing (compaction caps, group counts, key bounds) is
    # LEARNED across runs instead of host-synced mid-query: the device scalar
    # rides the final result transfer, a callback records the exact value on
    # the plan node, and if speculation was wrong the whole plan re-runs with
    # the now-known size. Mid-query int()/bool() pulls serialize the async
    # dispatch queue (~80 ms apiece on the tunneled v5e — see PERF.md); the
    # steady state here is ZERO host syncs before the result transfer.
    def defer_scalar(self, dev_scalar, callback):
        """callback(host_value) -> True to request a plan re-run."""
        self._deferred.append((dev_scalar, callback))

    def _process_deferred(self, host_vals) -> bool:
        rerun = False
        for (_, cb), v in zip(self._deferred, host_vals):
            if cb(v):
                rerun = True
        self._deferred = []
        return rerun

    # -- entry ---------------------------------------------------------------
    def run(self, plan: P.PlanNode, output: List[Tuple[str, str, LogicalType]]) -> Result:
        from duckdb_tpu.ops import strings as _dstr

        tok = _dstr.ACTIVE_LOG.set(
            getattr(self.catalog, "log_manager", None))
        try:
            return self._run_outer(plan, output)
        finally:
            _dstr.ACTIVE_LOG.reset(tok)

    def _run_outer(self, plan, output) -> Result:
        if not getattr(self, "_in_chunked", False):
            from duckdb_tpu.execution.chunked import try_chunked
            res = try_chunked(self, plan, output)
            if res is not None:
                return res
        for _attempt in range(4):
            res, rerun = self._run_attempt(plan, output)
            if not rerun:
                return res
        res, _ = self._run_attempt(plan, output)
        return res

    def _run_attempt(self, plan, output) -> Tuple[Result, bool]:
        # per-run plan-node memo: the fused-tail attempt may execute a
        # subtree and then fall back, and DAG plans share subtrees — never
        # execute the same node twice in one run
        self._batch_memo = {}
        self._deferred = []
        res = self._run_fused_tail(plan, output)
        if res is not None:
            res, host_deferred = res
            return res, self._process_deferred(host_deferred)
        batch = self.execute(plan)
        n = batch.count_live()
        idx, _ = compact_indices(batch.live, max(1, pad_bucket(n)))
        cols = [batch.src[key] for _, key, _ in output]
        device = [(c.data[idx][:n],
                   c.data_hi[idx][:n] if c.data_hi is not None else None,
                   _full_valid(c, batch.plen)[idx][:n] if c.validity is not None
                   else None) for c in cols]
        host, host_deferred = jax.device_get(
            (device, tuple(d for d, _ in self._deferred)))
        rerun = self._process_deferred(host_deferred)
        columns = []
        for (d, dh, v), c in zip(host, cols):
            if dh is not None:
                # exact 128-bit recombination on host: hi·2^64 + uint64(lo)
                d = [int(h) * (1 << 64) + (int(l) & ((1 << 64) - 1))
                     for h, l in zip(dh, d)]
                d = np.array(d, dtype=object)
            columns.append((d, v, c.dict_values))
        return Result(names=[n_ for n_, _, _ in output],
                      types=[t for _, _, t in output], columns=columns,
                      nrows=n), rerun

    def _run_fused_tail(self, plan, output) -> Optional[Result]:
        """Fuse Limit?(Order?(Project(X))) + result materialization into one
        compiled program over X's columns — a single device dispatch and a
        single host transfer for the whole query tail. When X is itself a
        fusable aggregate, the ENTIRE query (scan→filter→aggregate→project→
        order→limit→collect) becomes one XLA program."""
        from duckdb_tpu.execution.fused_agg import build_fused_agg
        from duckdb_tpu.execution.tracing import TraceEnv, run_jitted
        from duckdb_tpu.ops import sort as S

        if any(t.id in (TypeId.LIST, TypeId.STRUCT, TypeId.MAP, TypeId.BLOB,
                        TypeId.ARRAY, TypeId.UNION, TypeId.BIT)
               for _, _, t in output):
            return None  # nested outputs carry object dicts the packed
            # tail would drop: general path. (HUGEINT outputs stay: narrow
            # values pack as int64, wide DIRECT refs ride the (lo, hi)
            # imat pair below — integer sums are HUGEINT-typed now.)
        node = plan
        limit_node = order_node = None
        if isinstance(node, P.Limit):
            limit_node, node = node, node.child
        if isinstance(node, P.Order):
            order_node, node = node, node.child
        if not isinstance(node, P.Project):
            return None
        proj, child = node, node.child

        fa = None
        if isinstance(child, P.Aggregate):
            try:
                fa = build_fused_agg(self, child)
            except (KeyError, B.BindError):
                fa = None
            if fa is not None and fa.total > (1 << 20):
                fa = None  # sorting the full dense domain would dominate
            if fa is not None:
                from duckdb_tpu.execution.fused_agg import _num_shards

                if _num_shards(self, fa) > 1:
                    fa = None  # distributed path runs via try_fused_aggregate
        if fa is not None:
            batch = fa.base_batch
            inner_plen = fa.total
        else:
            batch = self.execute(child)
            inner_plen = batch.plen
        if (order_node is not None and inner_plen >= (1 << 14)
                and self._join_shards(rows=inner_plen) > 1):
            return None  # big sorts distribute via _exec_Order's
            # range-partition path (small ones keep the fused tail)

        overlay = dict(proj.items)
        out_keys = [key for _, key, _ in output]

        # wide (>int64) values carry a (lo, hi) plane pair; the packed tail
        # supports them for DIRECT output refs (two imat rows recombined
        # host-side). A wide plane feeding a computed expression or an
        # ORDER BY key falls back to the eager path.
        if fa is not None:
            wide_src = {a.key for a in child.aggs
                        if getattr(a, "_wide", False)}

            def _is_wide(k):
                return k in wide_src
        else:
            def _is_wide(k):
                try:
                    return batch.src[k].data_hi is not None
                except KeyError:
                    return False

        wide_flags = []
        for _, key, t in output:
            e = overlay.get(key)
            if e is None:
                wide = _is_wide(key)
            elif isinstance(e, (B.BoundColumnRef, B.BoundAggregateRef)):
                wide = _is_wide(e.key)
            else:
                for nn in B.walk(e):
                    if isinstance(nn, (B.BoundColumnRef,
                                       B.BoundAggregateRef)) \
                            and _is_wide(nn.key):
                        return None  # computed expr over a wide plane
                wide = False
            # a wide-capable TYPE may grow a high plane inside the trace
            # (md5_number, hugeint-producing functions) even when no wide
            # input feeds it — ship the (lo, hi) pair for those too; a
            # narrow column sign-extends into the hi row at no cost
            wide_flags.append(wide or t.id is TypeId.HUGEINT
                              or (t.id is TypeId.DECIMAL
                                  and (t.width or 0) > 18))
        if order_node is not None:
            for e, _, _ in order_node.items:
                for nn in B.walk(e):
                    if isinstance(nn, (B.BoundColumnRef,
                                       B.BoundAggregateRef)) \
                            and _is_wide(nn.key):
                        return None  # ordering by a wide plane: eager path
        exprs = [e for _, e in proj.items]
        if order_node:
            exprs = exprs + [it[0] for it in order_node.items]
        if fa is not None:
            keyrefs = [B.BoundColumnRef(k, batch.src[k].ltype)
                       for k in fa.needed]
            in_exprs = keyrefs
        else:
            in_exprs = exprs
        if limit_node:
            off = limit_node.offset or 0
            cap = min(inner_plen, max(1, pad_bucket(
                off + (limit_node.n if limit_node.n is not None else inner_plen))))
        else:
            off = 0
            cap = inner_plen

        def tail(env2):
            plen2 = env2.plen
            live = env2.live
            out_cols = {k: env2[k] for k in out_keys}
            if order_node is not None:
                norm = []
                for e, desc, nf in order_node.items:
                    c = e.eval(env2)
                    nf2 = False if nf is None else nf
                    data = jnp.broadcast_to(c.data, (plen2,))
                    if c.ltype.id is TypeId.VARCHAR:
                        data = data.astype(jnp.int64)
                    norm.append(S.orderable_int64(data, c.validity, desc, nf2))
                perm = S.sort_permutation(norm, live)
            else:
                # int32 compaction (jnp.nonzero under x64 emits an emulated
                # int64 scatter — ~434 ms flat on v5e; see ops/compact.py)
                from duckdb_tpu.ops.compact import compact_indices

                perm, _ = compact_indices(live, plen2)
                perm = jnp.where(jnp.arange(plen2, dtype=jnp.int32)
                                 < jnp.sum(live), perm, plen2 - 1)
            n_live = jnp.sum(live)
            n_out = n_live - off
            if limit_node is not None and limit_node.n is not None:
                n_out = jnp.minimum(n_out, limit_node.n)
            n_out = jnp.maximum(n_out, 0)
            rows = perm[jnp.clip(jnp.arange(cap) + off, 0, plen2 - 1)]
            # pack output columns into one int64 + one float64 matrix (+ one
            # validity matrix): a fixed handful of host transfers regardless
            # of column count — tunnel-latency resilience. (No bitcasts: the
            # TPU x64-emulation pass cannot rewrite f64<->s64 bitcasts.)
            ints, floats, valids = [], [], []
            for k, wf in zip(out_keys, wide_flags):
                c = out_cols[k]
                data = jnp.broadcast_to(c.data, (plen2,))[rows]
                if wf:
                    # wide value: (lo, hi) pair as two imat rows; a column
                    # that turned out narrow sign-extends into the hi row
                    ints.append(data.astype(jnp.int64))
                    hi = (jnp.broadcast_to(c.data_hi, (plen2,))[rows]
                          if c.data_hi is not None
                          else data.astype(jnp.int64) >> 63)
                    ints.append(hi.astype(jnp.int64))
                elif jnp.issubdtype(data.dtype, jnp.floating):
                    floats.append(data.astype(jnp.float64))
                else:
                    ints.append(data.astype(jnp.int64))
                valids.append(jnp.broadcast_to(c.validity, (plen2,))[rows]
                              if c.validity is not None
                              else jnp.ones((cap,), jnp.bool_))
            # n_out rides as an extra imat row: one fewer host-staged buffer
            ints.append(jnp.full((cap,), n_out, jnp.int64))
            imat = jnp.stack(ints)
            fmat = (jnp.stack(floats) if floats
                    else jnp.zeros((0, cap), jnp.float64))
            return (imat, fmat, jnp.stack(valids))

        def body(env):
            if fa is not None:
                agg_cols, occ, extras = fa.body(env)
                env2 = TraceEnv(agg_cols, fa.total, occ > 0, overlay=overlay)
                return tail(env2) + (extras,)
            return tail(env) + ((),)

        try:
            imat, fmat, valids, extras = run_jitted(
                proj, "tail", batch, in_exprs, body,
                overlay=None if fa is not None else overlay,
                aux=fa.aux if fa is not None else None,
                variant=fa.variant if fa is not None else ())
        except (KeyError, B.BindError,
                jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            return None  # host-only function somewhere: general path
        if fa is not None:
            n_sc = len(fa.extras_cb)
            for e, cb in zip(extras[:n_sc], fa.extras_cb):
                self.defer_scalar(e, cb)
            for e, cb in zip(extras[n_sc:], fa.array_extras_cb):
                cb(e)  # device array (probe-cache store): no host sync
        (host_ints, host_floats, host_valids), host_deferred = jax.device_get(
            ((imat, fmat, valids), tuple(d for d, _ in self._deferred)))
        n = int(host_ints[-1][0])
        host_ints = host_ints[:-1]
        columns = []
        if fa is not None:
            dict_lookup = {k: dv for k, (t, dv) in fa.out_types.items()}
        meta_env = batch.env()
        ii = fi = 0
        for i, (name, key, t) in enumerate(output):
            dvals = None
            if t.id is TypeId.VARCHAR:
                if fa is not None:
                    e = overlay.get(key)
                    rk = e.key if isinstance(e, (B.BoundColumnRef,
                                                 B.BoundAggregateRef)) else None
                    dvals = dict_lookup.get(rk) if rk else None
                    if dvals is None:
                        return None  # complex varchar projection: fall back
                else:
                    dvals = (overlay[key].eval(meta_env).dict_values
                             if key in overlay else None)
            if wide_flags[i]:
                lo, hi = host_ints[ii][:n], host_ints[ii + 1][:n]
                ii += 2
                if np.array_equal(hi, lo >> 63):
                    d = lo  # hi is pure sign-extension: value fits int64
                else:
                    d = np.array(
                        [int(h) * (1 << 64) + (int(l) & ((1 << 64) - 1))
                         for h, l in zip(hi, lo)], dtype=object)
            elif t.is_float:
                d = host_floats[fi][:n]
                fi += 1
            else:
                d = host_ints[ii][:n].astype(t.np_dtype)
                ii += 1
            v = host_valids[i][:n]
            columns.append((d, None if v.all() else v, dvals))
        return Result(names=[n_ for n_, _, _ in output],
                      types=[t for _, _, t in output], columns=columns,
                      nrows=n), host_deferred

    def execute(self, node: P.PlanNode) -> Batch:
        memo = getattr(self, "_batch_memo", None)
        if memo is None:
            memo = self._batch_memo = {}
        b = memo.get(id(node))
        if b is None:
            b = getattr(self, "_exec_" + type(node).__name__)(node)
            memo[id(node)] = b
        return b

    # -- scans / filters / projections ---------------------------------------
    def _exec_Scan(self, node: P.Scan) -> Batch:
        entry = self._get_table(node.table)
        plen = max(128, pad_bucket(entry.nrows))
        keymap = {key: col for col, key, _ in node.cols}
        cache = entry.__dict__.setdefault("_live_cache", {})
        if (plen, entry.nrows) not in cache:
            cache.clear()
            cache[(plen, entry.nrows)] = jnp.arange(plen) < entry.nrows
        live = cache[(plen, entry.nrows)]
        return Batch(src=TableCols(entry, keymap, plen), plen=plen, live=live,
                     pristine=True)

    def _exec_Filter(self, node: P.Filter) -> Batch:
        from duckdb_tpu.execution.tracing import run_jitted

        b = self.execute(node.child)

        def body(env):
            c = node.expr.eval(env)
            keep = jnp.broadcast_to(c.data.astype(jnp.bool_), (b.plen,))
            keep = jnp.logical_and(keep, _full_valid(c, b.plen))  # NULL → reject
            return jnp.logical_and(env.live, keep)

        try:
            live = run_jitted(node, "filter", b, [node.expr], body)
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            live = body(b.env())  # host-only function in the predicate
        return Batch(src=b.src, plen=b.plen, live=live)

    def _exec_Project(self, node: P.Project) -> Batch:
        b = self.execute(node.child)
        env = b.env()
        cols = {}
        for key, expr in node.items:
            c = expr.eval(env)
            cols[key] = Column(data=_bdata(c, b.plen), ltype=c.ltype,
                               validity=c.validity, dict_values=c.dict_values,
                               data_hi=c.data_hi)
        # keep the child source reachable for ORDER BY exprs over input cols
        return Batch(src=ChainCols([DictCols(cols), b.src]), plen=b.plen, live=b.live)

    # -- joins ---------------------------------------------------------------
    def _join_keys(self, batch: Batch, key_exprs) -> Tuple[jnp.ndarray, jnp.ndarray, list]:
        """Evaluate equi-key exprs → (per-key int64 arrays, key_valid mask, meta)."""
        env = batch.env()
        arrs, valid = [], jnp.ones((batch.plen,), jnp.bool_)
        for e in key_exprs:
            c = e.eval(env)
            if c.ltype.id is TypeId.VARCHAR:
                arrs.append((c, None))
            else:
                arrs.append((c, None))
            valid = jnp.logical_and(valid, _full_valid(c, batch.plen))
        return arrs, valid

    def _key_bounds(self, batch: Batch, expr) -> Optional[Tuple[int, int]]:
        """Static value bounds for a join-key expr, from table stats."""
        from duckdb_tpu.planner.bound import BoundColumnRef

        if isinstance(expr, BoundColumnRef):
            try:
                return batch.src.stats_range(expr.key)
            except KeyError:
                return None
        return None

    def _pack_keys(self, probe_b: Batch, build_b: Batch, probe_keys, build_keys):
        """Pack multi-column equi-keys into one int64 per side.

        Per-key value ranges come from table stats when available (the
        zone-map analog of duckdb sizing its perfect-hash join from stats,
        perfect_hash_join_executor.cpp), else one device min/max sync over
        the build side.
        """
        p_arrs, p_valid = self._join_keys(probe_b, probe_keys)
        b_arrs, b_valid = self._join_keys(build_b, build_keys)
        packed_p = jnp.zeros((probe_b.plen,), jnp.int64)
        packed_b = jnp.zeros((build_b.plen,), jnp.int64)
        dense_size = 1  # Π (rng_i + 1) — direct-address table size
        key_sizes: List[int] = []  # per-key digit radix (rng_i + 1)
        for i, ((pc, _), (bc, _)) in enumerate(zip(p_arrs, b_arrs)):
            if pc.ltype.id is TypeId.VARCHAR:
                from duckdb_tpu.planner.bound import _varchar_rank_luts

                lp, lb = _varchar_rank_luts(pc, bc)
                pd = lp[jnp.clip(pc.data, 0, len(lp) - 1)].astype(jnp.int64)
                bd = lb[jnp.clip(bc.data, 0, len(lb) - 1)].astype(jnp.int64)
                lo, hi = 0, max(int(lp.shape[0]), int(lb.shape[0]))
            else:
                pd = _bdata(pc, probe_b.plen).astype(jnp.int64)
                bd = _bdata(bc, build_b.plen).astype(jnp.int64)
                bounds = self._key_bounds(build_b, build_keys[i])
                if bounds is None:
                    blive = jnp.logical_and(build_b.live, b_valid)
                    if not bool(jnp.any(blive)):
                        bounds = (0, 0)
                    else:
                        bounds = (int(jnp.min(jnp.where(blive, bd, _I64_MAX))),
                                  int(jnp.max(jnp.where(blive, bd, _I64_MIN))))
                lo, hi = bounds
            rng = hi - lo + 1
            packed_p = packed_p * jnp.int64(rng + 1) + jnp.clip(pd - lo, -1, rng)
            packed_b = packed_b * jnp.int64(rng + 1) + jnp.clip(bd - lo, -1, rng)
            dense_size *= rng + 1
            key_sizes.append(rng + 1)
            # probe values outside [lo,hi] clip to -1/rng sentinels per key
            # column, which cannot collide with any in-range packed build key.
        return packed_p, p_valid, packed_b, b_valid, dense_size, key_sizes

    # direct-address join table cap: 2^27 int32 slots = 512 MiB — cheap
    # against 16 GB HBM, and the sorted fallback it avoids is a ~24-round
    # serialized searchsorted chain (TPC-H Q3 SF10: 48 s -> sub-second)
    DENSE_JOIN_LIMIT = 1 << 27

    # eager-join build cache row cap: cached Batches pin device planes
    EAGER_BUILD_CACHE_MAX = 1 << 25

    def _exec_Join(self, node: P.Join) -> Batch:
        probe_b = self.execute(node.probe)
        build_b = self._exec_build_cached(node)
        if not node.probe_keys and node.jtype not in ("asof", "asof_left"):
            # keyless join: planner routes inequality-only ON conditions
            # here (instead of CrossJoin + Filter) so the IEJoin path can
            # prune candidates by a sorted range before pair expansion
            out = self._ie_join(node, probe_b, build_b)
            if out is not None:
                return out
            return self._keyless_cross(node, probe_b, build_b)
        pk, p_valid, bk, b_valid, dense_size, key_sizes = self._pack_keys(
            probe_b, build_b, node.probe_keys, node.build_keys
        )
        build_live = jnp.logical_and(build_b.live, b_valid)
        probe_live = jnp.logical_and(probe_b.live, p_valid)

        if node.jtype in ("asof", "asof_left"):
            return self._asof_join(node, probe_b, build_b, pk, bk,
                                   probe_live, build_live)
        if node.jtype in ("inner", "semi"):
            # runtime join-filter pushdown (BuildPrefixRangeFilter analog,
            # reference join_hashtable.cpp:1011): tighten the probe mask
            # by the build's ACTUAL packed-key range — device-side, no
            # host sync. Selective (filtered) builds drop most probe rows
            # before any join work; packing is monotone per key slot so
            # the packed range is a sound necessary condition. Anti/outer
            # probes must keep non-matching rows, so only inner/semi.
            info = jnp.iinfo(pk.dtype)
            blo = jnp.min(jnp.where(build_live, bk, info.max))
            bhi = jnp.max(jnp.where(build_live, bk, info.min))
            probe_live = jnp.logical_and(
                probe_live, jnp.logical_and(pk >= blo, pk <= bhi))
        if node.jtype in ("semi", "anti") and node.extra is not None:
            out = self._try_semi_neq(node, probe_b, build_b)
            if out is not None:
                return out
        unique = self._build_known_unique(node, build_b)
        n_shards = self._join_shards(rows=max(probe_b.plen, build_b.plen))
        if n_shards > 1:
            mgr = self.catalog.settings_manager
            thresh = int(mgr.get("exchange_join_threshold", 1 << 24))
            if dense_size > thresh:
                if unique:
                    out = self._exchange_join(node, probe_b, build_b, pk, bk,
                                              probe_live, build_live,
                                              n_shards)
                else:
                    out = self._exchange_join_dup(node, probe_b, build_b, pk,
                                                  bk, probe_live, build_live,
                                                  n_shards)
                if out is not None:
                    return out
        if dense_size <= self.DENSE_JOIN_LIMIT:
            out = self._dense_join(node, probe_b, build_b, pk, bk,
                                   probe_live, build_live, dense_size,
                                   known_unique=unique)
            if out is not None:
                return out
        out = self._bucket_join(node, probe_b, build_b, pk, bk,
                                probe_live, build_live, key_sizes,
                                known_unique=unique)
        if out is not None:
            return out
        return self._sorted_join(node, probe_b, build_b, pk, bk,
                                 probe_live, build_live)

    def _exec_build_cached(self, node: P.Join) -> Batch:
        """Execute the build side with a version-keyed batch cache on the
        join node — the eager-path analog of the fused pipeline's
        build-prep cache. A warm query skips the entire build subtree
        (aggregate builds from flattened correlated subqueries are the
        expensive case: q20 re-ran a 6M-row 2-key grouped aggregate on
        every call). The cache key is every scanned (table, nrows,
        version) under the build; chunked scan overrides disable it."""
        from duckdb_tpu.execution.fused_agg import _scan_versions

        vkey = _scan_versions(self, node.build)
        if vkey is None:
            return self.execute(node.build)
        from duckdb_tpu.execution.fused_agg import _cache_store

        cache = _cache_store(node, "_eager_build_cache")
        hit = cache.get(vkey)
        if hit is not None:
            return hit
        build_b = self.execute(node.build)
        if build_b.plen <= self.EAGER_BUILD_CACHE_MAX:
            cache.clear()
            cache[vkey] = build_b
        return build_b

    def _build_known_unique(self, node, build_b) -> bool:
        """True if catalog stats prove the build key is row-unique — skips
        runtime duplicate/occupancy checks (mid-join host syncs). A
        composite key is unique if the subset owned by ANY single table is
        already unique (extra key columns can only refine)."""
        from duckdb_tpu.planner.bound import (BoundAggregateRef,
                                              BoundColumnRef)

        if not node.build_keys or not all(
                isinstance(e, (BoundColumnRef, BoundAggregateRef))
                for e in node.build_keys):
            return False
        keys = [e.key for e in node.build_keys]

        # GROUP BY outputs are unique BY CONSTRUCTION: a build side that
        # is (Filter/Project)*(Aggregate) with the join keys covering the
        # aggregate's full group-key set has one row per key tuple —
        # the flattened-correlated-subquery shape (TPC-H Q17/Q20/Q2).
        b = node.build
        akeys = list(keys)
        while isinstance(b, (P.Project, P.Filter)):
            if isinstance(b, P.Project):
                remap = {k: e for k, e in b.items}
                nxt = []
                for k in akeys:
                    e = remap.get(k)
                    if isinstance(e, (BoundColumnRef, BoundAggregateRef)):
                        nxt.append(e.key)
                    else:
                        nxt.append(k)
                akeys = nxt
            b = b.child
        if isinstance(b, P.Aggregate) and b.groups:
            gkeys = {gk for gk, _ in b.groups}
            if set(akeys) >= gkeys:  # covering the group keys ⇒ unique
                return True
        if not all(isinstance(e, BoundColumnRef) for e in node.build_keys):
            return False
        # walk chain sources to the TableCols owning each key.
        # GatherCols is OPAQUE: a gather may duplicate rows (join expansion,
        # dim-side gathers), which destroys key uniqueness even when the
        # underlying table column is unique.
        per_entry: Dict[int, Tuple[TableEntry, list]] = {}
        stack = [build_b.src]
        n_found = 0
        while stack and n_found < len(keys):
            s_ = stack.pop()
            if isinstance(s_, ChainCols):
                stack.extend(s_.sources)
            elif isinstance(s_, TableCols):
                owned = [k for k in keys if k in s_.keymap]
                if owned:
                    ent, cols = per_entry.setdefault(
                        id(s_.entry), (s_.entry, []))
                    cols.extend(s_.keymap[k] for k in owned)
                    n_found += len(owned)
        for ent, cols in per_entry.values():
            try:
                if len(cols) == 1:
                    if ent.distinct_count(cols[0]) == ent.nrows:
                        return True
                elif ent.composite_unique(tuple(cols)):
                    return True
            except Exception:  # noqa: BLE001
                continue
        return False

    def _dense_join(self, node, probe_b, build_b, pk, bk, probe_live,
                    build_live, size, known_unique=False):
        """Perfect direct-address join (unique build keys): probe = 1 gather.

        The duckdb PerfectHashJoinExecutor analog
        (src/execution/operator/join/perfect_hash_join_executor.cpp),
        generalized to every PK-side build with a stats-bounded dense range.
        Inner/left joins keep the PROBE block shape (mask, no expansion) —
        zero cardinality syncs.
        """
        rows = jnp.arange(build_b.plen, dtype=jnp.int32)
        slot = jnp.where(build_live, jnp.clip(bk, 0, size), size).astype(jnp.int32)
        if not known_unique:
            occ = jnp.zeros((size + 1,), jnp.int32).at[slot].add(1,
                                                                 mode="drop")
            if int(jnp.max(occ[:size])) > 1:
                return None  # duplicate build keys → sorted path
        slots = jnp.full((size + 1,), -1, jnp.int32).at[slot].set(
            jnp.where(build_live, rows, -1), mode="drop")
        brow, matched = self._probe_dense(node, slots, size, pk, probe_live,
                                          probe_b.plen)
        return self._one_match_tail(node, probe_b, build_b, brow, matched,
                                    probe_live, build_live)

    def _one_match_tail(self, node, probe_b, build_b, brow, matched,
                        probe_live, build_live):
        """Join result when each probe row has ≤1 build match: the output
        keeps the PROBE block shape (mask + gather, no expansion, zero
        cardinality syncs). Shared by the dense and bucket paths."""
        brow_c = jnp.clip(brow, 0, build_b.plen - 1)

        if node.extra is not None:
            pair_src = ChainCols([
                probe_b.src,
                GatherCols(build_b.src, brow_c, null_rows=~matched),
            ])
            env = EvalEnv(cols=pair_src, plen=probe_b.plen, live=matched)
            c = node.extra.eval(env)
            em = jnp.logical_and(c.data.astype(jnp.bool_),
                                 _full_valid(c, probe_b.plen))
            matched = jnp.logical_and(matched, jnp.broadcast_to(em, (probe_b.plen,)))

        if node.jtype == "semi":
            return Batch(src=probe_b.src, plen=probe_b.plen,
                         live=jnp.logical_and(probe_b.live, matched))
        if node.jtype == "anti":
            live = jnp.logical_and(probe_b.live, ~matched)
            if node.null_aware:
                live = self._null_aware_anti(live, probe_b, build_b,
                                             probe_live, build_live)
            return Batch(src=probe_b.src, plen=probe_b.plen, live=live)
        if node.jtype == "inner":
            src = ChainCols([
                probe_b.src,
                GatherCols(build_b.src, brow_c),
            ])
            return Batch(src=src, plen=probe_b.plen, live=matched)
        if node.jtype in ("left", "single"):
            src = ChainCols([
                probe_b.src,
                GatherCols(build_b.src, brow_c, null_rows=~matched),
            ])
            return Batch(src=src, plen=probe_b.plen, live=probe_b.live)
        return None  # full outer → sorted path

    def _log(self, level: str, log_type: str, msg: str):
        lm = getattr(self.catalog, "log_manager", None)
        if lm is not None:
            lm.log(level, log_type, msg)

    def _join_shards(self, rows: Optional[int] = None) -> int:
        """Shard count for distributed operators.

        num_shards = 0 (the default) is the AUTO policy: distribute over
        every visible device once the working set exceeds auto_shard_rows
        — the reference parallelizes everything by default via its morsel
        scheduler (src/parallel/task_scheduler.cpp); the mesh analog is
        sharding by default. `rows=None` means the caller doesn't know the
        size yet: auto says yes and the caller re-checks. Logs when a
        requested shard count silently degrades."""
        import jax as _jax

        mgr = getattr(self.catalog, "settings_manager", None)
        n = int(mgr.get("num_shards", 0)) if mgr else 1
        if n == 1:
            return 1
        nd = len(_jax.devices())
        if n > 1:
            if nd < n:
                self._log("WARN", "sharding",
                          f"num_shards={n} requested but only {nd} devices "
                          "visible; running single-chip")
                return 1
            return n
        # auto policy
        if nd <= 1:
            return 1
        min_rows = int(mgr.get("auto_shard_rows", 1 << 15)) if mgr \
            else (1 << 15)
        if rows is not None and rows < min_rows:
            return 1
        return nd

    # exchange send-buffer slack over the uniform-hash expectation
    EXCHANGE_SLACK = 2

    def _exchange_join(self, node, probe_b, build_b, pk, bk, probe_live,
                       build_live, n):
        """Distributed join via all_to_all hash repartitioning: both sides'
        rows route to their key's owner chip; each chip joins its partition
        locally, entirely on-device (one compiled program, two all_to_all
        collectives). Unique-build joins only (planner-proven); send-bucket
        overflow is detected via a psum'd drop counter and falls back.

        Reference analog: radix-partitioned hash join repartitioning,
        /root/reference/src/execution/radix_partitioned_hashtable.cpp:531-691.
        """
        if node.jtype not in ("inner", "left", "single", "semi", "anti"):
            return None
        import math

        from duckdb_tpu.parallel.shard import get_exchange_join

        plen, blen = probe_b.plen, build_b.plen
        plen2 = plen + ((-plen) % n)
        blen2 = blen + ((-blen) % n)
        r_p, r_b = plen2 // n, blen2 // n
        learned = getattr(node, "_exchange_caps", None)
        if learned is not None:
            cap_p, cap_b = learned  # sized from a previous run's demand
        else:
            cap_p = max(64, math.ceil(r_p / n * self.EXCHANGE_SLACK))
            cap_b = max(64, math.ceil(r_b / n * self.EXCHANGE_SLACK))
        step = get_exchange_join(n, cap_p, cap_b)

        def pad(x, m, fill):
            extra = m - x.shape[0]
            if extra == 0:
                return x
            return jnp.concatenate(
                [x, jnp.full((extra,), fill, x.dtype)])

        # left/single must route ALL live probe rows (NULL-key rows emit a
        # NULL-padded output row); their keys are replaced with a negative
        # sentinel — live build packed keys are always ≥ 0 (in-stats digits)
        route_live = (probe_b.live if node.jtype in ("left", "single")
                      else probe_live)
        pk_send = jnp.where(probe_live, pk, jnp.int64(-2))
        rp, br, overflow, need_p, need_b = step(
            pad(pk_send, plen2, 0), pad(route_live, plen2, False),
            jnp.arange(plen2, dtype=jnp.int32),
            pad(bk, blen2, 0), pad(build_live, blen2, False),
            jnp.arange(blen2, dtype=jnp.int32))
        if int(overflow) > 0:  # host sync (also forces the program)
            # hash skew: grow both capacities to the kernels' own pmax'd
            # per-destination demand (exact, counted pre-truncation) and
            # retry — one retry always suffices since the demand is exact.
            # The MaybeRepartition analog
            # (/root/reference/src/execution/radix_partitioned_hashtable
            # .cpp:545-691); only degenerate skew (one key owning most of
            # a side) still falls back single-chip via the memory bound.
            new_p = (cap_p if int(need_p) <= cap_p
                     else pad_bucket(int(need_p)))
            new_b = (cap_b if int(need_b) <= cap_b
                     else pad_bucket(int(need_b)))
            bound = max(cap_p, cap_b, max(r_p, r_b) * max(2, n // 2))
            if (not getattr(node, "_exchange_retried", False)
                    and max(new_p, new_b) <= bound):
                node._exchange_caps = (new_p, new_b)
                node._exchange_retried = True
                try:
                    self._log("INFO", "exchange_join",
                              f"send-bucket skew: growing caps "
                              f"({cap_p},{cap_b}) -> ({new_p},{new_b}) "
                              "and retrying")
                    return self._exchange_join(
                        node, probe_b, build_b, pk, bk, probe_live,
                        build_live, n)
                finally:
                    node._exchange_retried = False
            self._log("WARN", "exchange_join",
                      f"degenerate key skew ({int(overflow)} dropped, "
                      f"demand {int(need_p)}/{int(need_b)}) at "
                      f"num_shards={n}; falling back to single-chip join")
            return None
        self._log("INFO", "exchange_join",
                  f"join repartitioned over {n} shards "
                  f"(cap_p={cap_p}, cap_b={cap_b})")
        rp, br = _unshard(rp, br)  # downstream ops are single-device
        out_plen = rp.shape[0]
        matched = br >= 0
        routed = rp >= 0
        rp_c = jnp.clip(rp, 0, plen - 1)
        br_c = jnp.clip(br, 0, blen - 1)

        if node.extra is not None:
            pair_src = ChainCols([
                GatherCols(probe_b.src, rp_c),
                GatherCols(build_b.src, br_c, null_rows=~matched),
            ])
            env = EvalEnv(cols=pair_src, plen=out_plen,
                          live=jnp.logical_and(routed, matched))
            c = node.extra.eval(env)
            em = jnp.logical_and(c.data.astype(jnp.bool_),
                                 _full_valid(c, out_plen))
            matched = jnp.logical_and(matched,
                                      jnp.broadcast_to(em, (out_plen,)))

        if node.jtype in ("semi", "anti"):
            # scatter match flags back to the probe block shape
            m = jnp.zeros((plen2 + 1,), jnp.bool_).at[
                jnp.where(routed, rp, plen2)].max(matched, mode="drop")[:plen]
            if node.jtype == "semi":
                live = jnp.logical_and(probe_b.live, m)
            else:
                live = jnp.logical_and(probe_b.live, ~m)
                if node.null_aware:
                    live = self._null_aware_anti(live, probe_b, build_b,
                                                 probe_live, build_live)
            return Batch(src=probe_b.src, plen=plen, live=live)
        if node.jtype == "inner":
            src = ChainCols([
                GatherCols(probe_b.src, rp_c),
                GatherCols(build_b.src, br_c),
            ])
            return Batch(src=src, plen=out_plen,
                         live=jnp.logical_and(routed, matched))
        # left / single: every routed probe row emits one output row
        src = ChainCols([
            GatherCols(probe_b.src, rp_c),
            GatherCols(build_b.src, br_c, null_rows=~matched),
        ])
        return Batch(src=src, plen=out_plen, live=routed)

    def _exchange_join_dup(self, node, probe_b, build_b, pk, bk, probe_live,
                           build_live, n):
        """Distributed join with DUPLICATE build keys: all_to_all hash
        repartitioning of both sides, then each chip resolves its
        partition with a sorted-build RANGE probe (counts + pair
        expansion). The pair capacity per chip is learned across runs; an
        overflow (send bucket or expansion) falls back single-chip.

        Reference analog: radix-partitioned hash join,
        /root/reference/src/execution/radix_partitioned_hashtable.cpp:531-691.
        """
        if node.jtype not in ("inner", "semi", "anti"):
            return None
        import math

        from duckdb_tpu.parallel.shard import get_exchange_join_dup

        plen, blen = probe_b.plen, build_b.plen
        plen2 = plen + ((-plen) % n)
        blen2 = blen + ((-blen) % n)
        r_p, r_b = plen2 // n, blen2 // n
        learned_caps = getattr(node, "_exchange_caps", None)
        if learned_caps is not None:
            cap_p, cap_b = learned_caps
        else:
            cap_p = max(64, math.ceil(r_p / n * self.EXCHANGE_SLACK))
            cap_b = max(64, math.ceil(r_b / n * self.EXCHANGE_SLACK))
        # per-chip pair capacity learned from the kernel's own pmax'd
        # demand count (exact even when this attempt truncates)
        learned = getattr(node, "_exchange_pairs", None)
        if learned is not None:
            cap_out = max(128, pad_bucket(int(learned * 5 // 4) + 1))
        else:
            cap_out = max(128, pad_bucket(2 * cap_p))
        step = get_exchange_join_dup(n, cap_p, cap_b, cap_out)

        def pad(x, m, fill):
            extra = m - x.shape[0]
            if extra == 0:
                return x
            return jnp.concatenate([x, jnp.full((extra,), fill, x.dtype)])

        pr, br, pm, prr, overflow, pair_max, need_p, need_b = step(
            pad(jnp.where(probe_live, pk, jnp.int64(-2)), plen2, 0),
            pad(probe_live, plen2, False),
            jnp.arange(plen2, dtype=jnp.int32),
            pad(bk, blen2, 0), pad(build_live, blen2, False),
            jnp.arange(blen2, dtype=jnp.int32))
        host_ovf, host_pmax, h_np, h_nb = jax.device_get(
            (overflow, pair_max, need_p, need_b))  # 1 sync
        node._exchange_pairs = int(host_pmax)
        if int(host_ovf) > 0:
            # skew-aware growth: resize every overflowed capacity to the
            # kernel's own exact (pre-truncation, pmax'd) demand counts
            # and retry — send buckets and the pair expansion alike. One
            # retry suffices unless the probe partition itself changed
            # (it can't: capacities don't affect routing). Degenerate
            # skew past the memory bound falls back single-chip.
            new_p = cap_p if int(h_np) <= cap_p else pad_bucket(int(h_np))
            new_b = cap_b if int(h_nb) <= cap_b else pad_bucket(int(h_nb))
            bound = max(cap_p, cap_b, max(r_p, r_b) * max(2, n // 2))
            retried = getattr(node, "_exchange_retried", False)
            if not retried and max(new_p, new_b) <= bound:
                node._exchange_caps = (new_p, new_b)
                node._exchange_retried = True
                try:
                    self._log("INFO", "exchange_join",
                              f"dup-key exchange skew: caps "
                              f"({cap_p},{cap_b})->({new_p},{new_b}), "
                              f"pairs {cap_out}->{int(host_pmax)}; retry")
                    return self._exchange_join_dup(
                        node, probe_b, build_b, pk, bk, probe_live,
                        build_live, n)
                finally:
                    node._exchange_retried = False
            self._log("WARN", "exchange_join",
                      f"dup-key exchange overflow ({int(host_ovf)} rows) "
                      f"at num_shards={n}; falling back to single-chip")
            return None
        self._log("INFO", "exchange_join",
                  f"dup-key join repartitioned over {n} shards "
                  f"(cap_p={cap_p}, cap_b={cap_b}, cap_out={cap_out})")
        pr, br, pm, prr = _unshard(pr, br, pm, prr)  # single-device tail
        if node.jtype in ("semi", "anti"):
            m = jnp.zeros((plen2 + 1,), jnp.bool_).at[
                jnp.where(prr >= 0, prr, plen2)].max(
                pm, mode="drop")[:plen]
            if node.extra is not None:
                return None  # residual predicates need the pair list
            if node.jtype == "semi":
                live = jnp.logical_and(probe_b.live, m)
            else:
                live = jnp.logical_and(probe_b.live, ~m)
                if node.null_aware:
                    live = self._null_aware_anti(live, probe_b, build_b,
                                                 probe_live, build_live)
            return Batch(src=probe_b.src, plen=plen, live=live)
        out_plen = pr.shape[0]
        pr_c = jnp.clip(pr, 0, plen - 1)
        br_c = jnp.clip(br, 0, blen - 1)
        pair_live = pr >= 0
        src = ChainCols([
            GatherCols(probe_b.src, pr_c),
            GatherCols(build_b.src, br_c),
        ])
        if node.extra is not None:
            env = EvalEnv(cols=src, plen=out_plen, live=pair_live)
            c = node.extra.eval(env)
            em = jnp.logical_and(c.data.astype(jnp.bool_),
                                 _full_valid(c, out_plen))
            pair_live = jnp.logical_and(pair_live,
                                        jnp.broadcast_to(em, (out_plen,)))
        return Batch(src=src, plen=out_plen, live=pair_live)

    # bucket table width cap: gathers materialize (plen, B) candidate
    # matrices, so bound B by a memory budget over the probe block
    BUCKET_MEM_BUDGET = 256 << 20

    def _bucket_join(self, node, probe_b, build_b, pk, bk, probe_live,
                     build_live, key_sizes, known_unique=False):
        """Dense-bucket join: direct-address on a PREFIX of the packed key,
        with up to B duplicate build rows per slot.

        The TPU answer to the reference's radix-partitioned hash table
        (src/execution/join_hashtable.cpp chains / radix_partitioned_
        hashtable.cpp): where duckdb chases per-bucket row chains, we gather
        a fixed-width (plen, B) candidate matrix and resolve matches with
        one vectorized compare against the full packed key — no sort of the
        probe side, no searchsorted scan stages. Covers (a) multi-key joins
        whose combined domain exceeds the dense limit but whose leading
        key(s) fit (e.g. TPC-H partsupp's composite PK), and (b) single-key
        joins with duplicate build keys (fact-side builds).
        """
        total = 1
        for r in key_sizes:
            total *= r
        if total >= (1 << 62):
            return None  # packed key would overflow int64: unsafe compare
        # bucket on the contiguous packed-digit RUN with the largest domain
        # ≤ the dense limit (maximal slots → fewest duplicates per bucket);
        # a run [i, j) is extracted as (packed // Π sizes[j:]) % Π sizes[i:j]
        best = (0, 1, 1)  # (run_domain, run_prod, below_prod)
        nk = len(key_sizes)
        for i in range(nk):
            run = 1
            for j in range(i + 1, nk + 1):
                run *= key_sizes[j - 1]
                if run > self.DENSE_JOIN_LIMIT:
                    break
                below = 1
                for r in key_sizes[j:]:
                    below *= r
                if run > best[0]:
                    best = (run, run, below)
        if best[0] == 0:
            return None  # every single key alone too wide → sorted path
        S, below = best[1], best[2]
        blen = build_b.plen
        plen = probe_b.plen

        # build: sort rows by bucket slot, position-in-bucket via segmented
        # iota (one lax.sort + one scan — no scatter chain)
        def to_slot(packed):
            # floor-mod maps sentinel digits into [0, S) — harmless aliasing,
            # the full-packed-key compare decides actual matches
            s = packed // below if below > 1 else packed
            return s % S

        bcap = max(4, min(64, self.BUCKET_MEM_BUDGET // (8 * max(plen, 1))))
        sentinel = jnp.int64(-(1 << 62))  # outside any packed-key value

        # build state over a pristine base-table scan is deterministic given
        # (table, version): cache it on the entry (the duckdb-index analog —
        # repeated joins against the same build table skip the build sort +
        # occupancy sync entirely)
        cache_key = jc = None
        from duckdb_tpu.planner.bound import BoundColumnRef

        if (build_b.pristine and isinstance(build_b.src, TableCols)
                and all(isinstance(e, BoundColumnRef)
                        and e.ltype.id is not TypeId.VARCHAR
                        and e.key in build_b.src.keymap
                        for e in node.build_keys)):
            ent = build_b.src.entry
            cache_key = (
                tuple(build_b.src.keymap[e.key] for e in node.build_keys),
                S, below, ent.nrows, getattr(ent, "version", 0))
            jc = ent.__dict__.setdefault("_join_build_cache", {})
        cached = jc.get(cache_key) if jc is not None else None

        if cached is not None:
            Bc, table, bk_pad = cached
            if Bc > bcap:
                return None  # hot bucket for this probe size → sorted path
        else:
            slot_b = jnp.where(build_live, to_slot(bk), S).astype(jnp.int32)
            iota = jnp.arange(blen, dtype=jnp.int32)
            sorted_slot, perm_s = jax.lax.sort([slot_b, iota], num_keys=1,
                                               is_stable=False)
            idx32 = jnp.arange(blen, dtype=jnp.int32)
            boundary = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                        sorted_slot[1:] != sorted_slot[:-1]])
            # cummax, NOT associative_scan: the latter unrolls into ~90
            # uniquely-shaped eager compiles per scan (ops/scan.py)
            starts = jax.lax.cummax(jnp.where(boundary, idx32, 0))
            pos = idx32 - starts
            live_sorted = sorted_slot < S
            bmax = int(jnp.max(jnp.where(live_sorted, pos, 0))) + 1  # sync
            if bmax > bcap:
                return None  # hot bucket → sorted path
            Bc = bmax
            flat_idx = jnp.where(live_sorted, sorted_slot * Bc + pos, S * Bc)
            table = jnp.full((S * Bc + 1,), -1, jnp.int32).at[flat_idx].set(
                jnp.where(live_sorted, perm_s, -1), mode="drop")[:-1]
            bk_pad = jnp.where(build_live, bk, sentinel)
            if jc is not None:
                if len(jc) >= 4:  # bound cached device memory per table
                    jc.pop(next(iter(jc)))
                jc[cache_key] = (Bc, table, bk_pad)

        # probe: one gather of B candidates + full-packed-key compare
        slot_p = to_slot(pk).astype(jnp.int32)
        cand = table.reshape(S, Bc)[slot_p]  # (plen, Bc)
        ck = bk_pad[jnp.clip(cand, 0, blen - 1)]
        eq = jnp.logical_and(
            jnp.logical_and(cand >= 0, ck == pk[:, None]),
            probe_live[:, None])
        counts = jnp.sum(eq, axis=1).astype(jnp.int32)

        if node.jtype in ("semi", "anti") and node.extra is None:
            matched = counts > 0
            live = jnp.logical_and(
                probe_b.live, matched if node.jtype == "semi" else ~matched)
            if node.jtype == "anti" and node.null_aware:
                live = self._null_aware_anti(live, probe_b, build_b,
                                             probe_live, build_live)
            return Batch(src=probe_b.src, plen=plen, live=live)

        # unique build keys ⇒ ≤1 match per probe row, no sync needed
        maxc = 1 if known_unique else (
            int(jnp.max(counts)) if plen else 0)  # host sync
        if maxc <= 1 and node.jtype != "full":
            brow = jnp.max(jnp.where(eq, cand, -1), axis=1)
            matched = counts > 0
            out = self._one_match_tail(node, probe_b, build_b, brow, matched,
                                       probe_live, build_live)
            if out is not None:
                return out

        # general expansion: per-probe-row match list, row-major in a
        # (plen, Bc) matrix → reuse the shared expansion tail with
        # lo[row] = row * Bc
        eqc = jnp.cumsum(eq, axis=1).astype(jnp.int32)
        kpos = jnp.where(eq, eqc - 1, Bc)
        jmat = jnp.full((plen, Bc + 1), -1, jnp.int32).at[
            jnp.arange(plen)[:, None], kpos].set(cand, mode="drop")
        perm = jmat[:, :Bc].reshape(-1)
        lo = (jnp.arange(plen, dtype=jnp.int64) * Bc).astype(jnp.int32)
        return self._expand_tail(node, probe_b, build_b, counts, lo, perm,
                                 probe_live, build_live)

    def _asof_join(self, node, probe_b, build_b, pk, bk, probe_live,
                   build_live):
        """ASOF join: per probe row, the nearest build row satisfying the
        inequality within the equi-key group (reference:
        src/execution/operator/join/physical_asof_join.cpp). Build rows
        sort by (packed eq key, asof value); the match is one
        searchsorted — the ideal TPU shape for this operator.
        """
        e = node.extra
        if not (isinstance(e, B.BoundComparison)
                and e.op in (">=", ">", "<=", "<")):
            raise NotImplementedError("ASOF requires one inequality condition")

        def on(batch, expr):
            try:
                for nn in B.walk(expr):
                    if isinstance(nn, (B.BoundColumnRef, B.BoundAggregateRef)):
                        batch.src[nn.key]
                return True
            except KeyError:
                return False

        op = e.op
        if on(probe_b, e.left) and on(build_b, e.right):
            e_probe, e_build = e.left, e.right
        elif on(probe_b, e.right) and on(build_b, e.left):
            e_probe, e_build = e.right, e.left
            op = {">=": "<=", ">": "<", "<=": ">=", "<": ">"}[op]
        else:
            raise NotImplementedError("ASOF condition must span both sides")

        pc = e_probe.eval(probe_b.env())
        bc = e_build.eval(build_b.env())
        pav = _bdata(pc, probe_b.plen).astype(jnp.int64)
        bav = _bdata(bc, build_b.plen).astype(jnp.int64)
        probe_live = jnp.logical_and(probe_live, _full_valid(pc, probe_b.plen))
        build_live = jnp.logical_and(build_live, _full_valid(bc, build_b.plen))
        if op in ("<=", "<"):  # probe wants the smallest build value ≥ it
            pav, bav = -pav, -bav
            op = {"<=": ">=", "<": ">"}[op]
        # range-pack (eq key, asof value) into one sortable int64
        lo = int(jnp.min(jnp.where(build_live, bav, _I64_MAX)))
        hi = int(jnp.max(jnp.where(build_live, bav, _I64_MIN)))
        if not bool(jnp.any(build_live)):
            lo, hi = 0, 0
        rng = hi - lo + 1
        base = jnp.int64(rng + 2)
        pa_off = jnp.clip(pav - lo, -1, rng) + 1
        ba_off = jnp.clip(bav - lo, -1, rng) + 1
        combined_b = bk * base + ba_off
        adj = 0 if op in (">=",) else -1  # strict: match values < probe's
        combined_p = pk * base + pa_off + adj
        kb = jnp.where(build_live, combined_b, _I64_MAX)
        iota = jnp.arange(build_b.plen, dtype=jnp.int32)
        sorted_k, perm = jax.lax.sort([kb, iota], num_keys=1, is_stable=True)
        pos = jnp.searchsorted(sorted_k, jnp.where(
            probe_live, combined_p, _I64_MIN), side="right",
            method="sort") - 1
        posc = jnp.clip(pos, 0, build_b.plen - 1)
        cand_k = sorted_k[posc]
        same_group = (cand_k // base) == pk  # candidate in the same eq group
        matched = jnp.logical_and(jnp.logical_and(probe_live, pos >= 0),
                                  same_group)
        brow = jnp.where(matched, perm[posc], -1)
        brow_c = jnp.clip(brow, 0, build_b.plen - 1)
        src = ChainCols([
            probe_b.src,
            GatherCols(build_b.src, brow_c, null_rows=~matched),
        ])
        if node.jtype == "asof":
            return Batch(src=src, plen=probe_b.plen, live=matched)
        return Batch(src=src, plen=probe_b.plen, live=probe_b.live)

    def _try_semi_neq(self, node, probe_b, build_b):
        """Semi/anti join with a `probe.c <> build.c` residual WITHOUT pair
        expansion: EXISTS(key match ∧ build.c ≠ probe.c ∧ build.c NOT NULL)
        ⟺ count(key) > count(key, c). Covers the reference's Q21 shape
        (EXISTS/NOT EXISTS with one inequality) in two count probes.
        """
        e = node.extra
        if not (isinstance(e, B.BoundComparison) and e.op in ("<>", "!=")):
            return None

        def on(batch, expr):
            try:
                for nn in B.walk(expr):
                    if isinstance(nn, (B.BoundColumnRef, B.BoundAggregateRef)):
                        batch.src[nn.key]
                return True
            except KeyError:
                return False

        if on(probe_b, e.left) and on(build_b, e.right):
            e_probe, e_build = e.left, e.right
        elif on(probe_b, e.right) and on(build_b, e.left):
            e_probe, e_build = e.right, e.left
        else:
            return None

        pk1, p1v, bk1, b1v, _, _ = self._pack_keys(
            probe_b, build_b, node.probe_keys, node.build_keys)
        pk2, p2v, bk2, b2v, _, _ = self._pack_keys(
            probe_b, build_b, node.probe_keys + [e_probe],
            node.build_keys + [e_build])
        # counts over key alone, build restricted to rows where the residual
        # column is NOT NULL (a NULL build value can never satisfy ≠)
        ec = e_build.eval(build_b.env())
        b_extra_valid = _full_valid(ec, build_b.plen)
        t1 = J.build_sorted(bk1, jnp.logical_and(
            jnp.logical_and(build_b.live, b1v), b_extra_valid))
        c1, _, _ = J.probe_counts(t1, pk1, jnp.logical_and(probe_b.live, p1v))
        t2 = J.build_sorted(bk2, jnp.logical_and(build_b.live, b2v))
        c2, _, _ = J.probe_counts(t2, pk2, jnp.logical_and(probe_b.live, p2v))
        # probe rows with NULL residual value: ≠ is NULL → never matched
        matched = jnp.logical_and(c1 > c2, p2v)
        live = jnp.logical_and(
            probe_b.live, matched if node.jtype == "semi" else ~matched)
        return Batch(src=probe_b.src, plen=probe_b.plen, live=live)

    def _null_aware_anti(self, live, probe_b, build_b, probe_live, build_live):
        """NOT IN semantics: a NULL probe key is never TRUE; any NULL build
        key makes x NOT IN (...) at best NULL → empty result (the
        reference's MARK-join NULL handling)."""
        null_probe = jnp.logical_and(probe_b.live, ~probe_live)
        live = jnp.logical_and(live, ~null_probe)
        build_has_null = jnp.any(jnp.logical_and(build_b.live, ~build_live))
        return jnp.logical_and(live, ~build_has_null)

    def _probe_dense(self, node, slots, size, pk, probe_live, plen):
        """Dense-table probe; distributes over the mesh when num_shards > 1.

        The build table is replicated (the reference's broadcast exchange,
        src/parallel/pipeline_broadcast_exchange.cpp, as a replicated
        sharding) and probe rows are row-sharded — probe lookups run
        entirely on-chip with no communication.
        """
        import jax as _jax

        n = self._join_shards(rows=plen)
        if n > 1 and len(_jax.devices()) >= n and plen % n == 0:
            from duckdb_tpu.parallel.shard import shard_map_compat
            from jax.sharding import Mesh, PartitionSpec as PS

            from duckdb_tpu.execution.fused_agg import _cache_store

            cache = _cache_store(node, "_probe_cache")
            sig = (n, plen, size)
            if sig not in cache:
                mesh = Mesh(np.array(_jax.devices()[:n]), ("dp",))

                def probe(slots, pk, live):
                    in_range = jnp.logical_and(pk >= 0, pk < size)
                    idx = jnp.clip(pk, 0, size - 1).astype(jnp.int32)
                    brow = jnp.where(in_range, slots[idx], -1)
                    return brow, jnp.logical_and(live, brow >= 0)

                probe = shard_map_compat(
                    probe, mesh, (PS(), PS("dp"), PS("dp")),
                    (PS("dp"), PS("dp")))
                from duckdb_tpu.parallel.shard import commit_inputs
                cache[sig] = commit_inputs(
                    _jax.jit(probe), mesh, (PS(), PS("dp"), PS("dp")))
            return _unshard(*cache[sig](slots, pk, probe_live))
        in_range = jnp.logical_and(pk >= 0, pk < size)
        idx = jnp.clip(pk, 0, size - 1).astype(jnp.int32)
        brow = jnp.where(in_range, slots[idx], -1)
        matched = jnp.logical_and(probe_live, brow >= 0)
        return brow, matched

    def _sorted_join(self, node, probe_b, build_b, pk, bk, probe_live,
                     build_live):
        table = J.build_sorted(bk, build_live)
        counts, lo, hi = J.probe_counts(table, pk, probe_live)
        return self._expand_tail(node, probe_b, build_b, counts, lo,
                                 table.perm, probe_live, build_live)

    def _expand_tail(self, node, probe_b, build_b, counts, lo, perm,
                     probe_live, build_live):
        """Join result via pair expansion. `perm` maps candidate position
        lo[row] + k (k < counts[row]) to a build row index. Shared by the
        sorted-build path (perm = sort permutation) and the bucket path
        (perm = per-probe-row match matrix, row-major)."""
        if node.jtype in ("semi", "anti") and node.extra is None:
            matched = counts > 0
            live = jnp.logical_and(
                probe_b.live, matched if node.jtype == "semi" else ~matched
            )
            if node.jtype == "anti" and node.null_aware:
                live = self._null_aware_anti(live, probe_b, build_b,
                                             probe_live, build_live)
            return Batch(src=probe_b.src, plen=probe_b.plen, live=live)

        # expand candidate pairs
        total = int(jnp.sum(counts))
        cap = max(128, pad_bucket(total))
        pr, br, out_live = J.expand_matches(counts, lo, perm, cap)
        pair_src = ChainCols([
            GatherCols(probe_b.src, pr),
            GatherCols(build_b.src, br),
        ])
        pair_live = out_live
        if node.extra is not None:
            env = EvalEnv(cols=pair_src, plen=cap, live=pair_live)
            c = node.extra.eval(env)
            em = jnp.logical_and(c.data.astype(jnp.bool_), _full_valid(c, cap))
            pair_live = jnp.logical_and(pair_live, jnp.broadcast_to(em, (cap,)))

        if node.jtype in ("semi", "anti"):
            any_match = jax.ops.segment_max(
                pair_live.astype(jnp.int32), pr, num_segments=probe_b.plen
            ) > 0
            live = jnp.logical_and(
                probe_b.live, any_match if node.jtype == "semi" else ~any_match
            )
            if node.jtype == "anti" and node.null_aware:
                live = self._null_aware_anti(live, probe_b, build_b,
                                             probe_live, build_live)
            return Batch(src=probe_b.src, plen=probe_b.plen, live=live)

        if node.jtype == "inner":
            return Batch(src=pair_src, plen=cap, live=pair_live)

        if node.jtype in ("left", "single", "full"):
            any_match = jax.ops.segment_max(
                pair_live.astype(jnp.int32), pr, num_segments=probe_b.plen
            ) > 0
            unmatched = jnp.logical_and(probe_b.live, ~any_match)
            n_pairs = int(jnp.sum(pair_live))
            n_unmatched = int(jnp.sum(unmatched))
            n_bun = 0
            if node.jtype == "full":
                # build rows never matched by any surviving pair
                bmatch = jnp.zeros((build_b.plen,), jnp.bool_).at[
                    jnp.where(pair_live, br, build_b.plen - 1)
                ].max(pair_live, mode="drop")
                b_unmatched = jnp.logical_and(build_live, ~bmatch)
                n_bun = int(jnp.sum(b_unmatched))
            out_cap = max(128, pad_bucket(n_pairs + n_unmatched + n_bun))
            pair_idx, _ = compact_indices(pair_live, out_cap)
            un_idx, _ = compact_indices(unmatched, out_cap)
            pos = jnp.arange(out_cap)
            from_pairs = pos < n_pairs
            un_pos = jnp.clip(pos - n_pairs, 0, out_cap - 1)
            out_probe = jnp.where(from_pairs, pr[pair_idx], un_idx[un_pos])
            out_build = jnp.where(from_pairs, br[pair_idx], -1)
            null_build = jnp.logical_not(from_pairs)
            null_probe = jnp.zeros((out_cap,), jnp.bool_)
            if node.jtype == "full":
                bun_idx, _ = compact_indices(b_unmatched, out_cap)
                from_bun = pos >= (n_pairs + n_unmatched)
                bun_pos = jnp.clip(pos - n_pairs - n_unmatched, 0, out_cap - 1)
                out_build = jnp.where(from_bun, bun_idx[bun_pos], out_build)
                null_build = jnp.logical_and(null_build, ~from_bun)
                out_probe = jnp.where(from_bun, 0, out_probe)
                null_probe = from_bun
            live = pos < (n_pairs + n_unmatched + n_bun)
            src = ChainCols([
                GatherCols(probe_b.src, out_probe,
                           null_rows=null_probe if node.jtype == "full" else None),
                GatherCols(build_b.src, out_build, null_rows=null_build),
            ])
            return Batch(src=src, plen=out_cap, live=live)

        raise NotImplementedError(f"join type {node.jtype}")

    # IEJoin pair-expansion guard: candidate totals beyond this raise
    # rather than allocating unbounded pair frames (the reference bounds
    # its IEJoin blocks similarly, physical_iejoin.cpp)
    IE_PAIR_CAP = 1 << 27

    def _ie_join(self, node: P.Join, probe_b, build_b):
        """Inequality join via sort + per-probe range (the TPU IEJoin).

        The reference's PhysicalIEJoin (src/execution/operator/join/
        physical_iejoin.cpp, after Khayyat et al.) sorts both sides on the
        first inequality and walks a permutation bitmap. The TPU shape:
        sort the BUILD side once on the first inequality's build
        expression, compute each probe row's candidate range with ONE
        searchsorted (prefix for probe>build, suffix for probe<build),
        and reuse the shared pair-expansion tail at total-candidate
        length. All ON conjuncts (including the sort predicate) are
        re-checked as the expansion residual, so the range is pure
        pruning — output-linear for banded/interval joins instead of the
        O(n·m) cross fallback. Returns None when no two-sided inequality
        conjunct exists or key dtypes are unsupported (caller falls back
        to the keyless cross expansion).
        """
        conds = (list(node.extra.exprs)
                 if isinstance(node.extra, B.BoundConjunction)
                 and node.extra.op == "and" else
                 [node.extra] if node.extra is not None else [])

        def on(batch, expr):
            try:
                for nn in B.walk(expr):
                    if isinstance(nn, (B.BoundColumnRef, B.BoundAggregateRef)):
                        batch.src[nn.key]
                return True
            except KeyError:
                return False

        # usable conjuncts: (probe_expr op build_expr). Grouped by the
        # build expression's UNDERLYING COLUMN — peeling monotone ±const
        # shifts (b.t + 3, b.t - INTERVAL x) which preserve sort order —
        # so that a lower and an upper bound on the same build column form
        # a BAND range (interval joins): candidates [pos_lo, pos_up)
        # instead of a half-plane.
        def peel(e):
            while True:
                if isinstance(e, B.BoundArithmetic) and e.op in ("+", "-"):
                    if isinstance(e.right, B.BoundLiteral):
                        e = e.left
                        continue
                    if e.op == "+" and isinstance(e.left, B.BoundLiteral):
                        e = e.right
                        continue
                # date/timestamp ± INTERVAL binds as a __interval_ fn;
                # constant intervals are monotone non-decreasing shifts
                if (isinstance(e, B.BoundFunction)
                        and getattr(e, "name", "").startswith("__interval_")
                        and e.name[-1] in "+-" and len(e.args) == 2
                        and isinstance(e.args[1], B.BoundLiteral)):
                    e = e.args[0]
                    continue
                return e

        flip = {">=": "<=", ">": "<", "<=": ">=", "<": ">"}
        groups: Dict[object, list] = {}
        for c in conds:
            if not (isinstance(c, B.BoundComparison)
                    and c.op in ("<", "<=", ">", ">=")):
                continue
            if on(probe_b, c.left) and on(build_b, c.right):
                op, ep, eb = c.op, c.left, c.right
            elif on(probe_b, c.right) and on(build_b, c.left):
                op, ep, eb = flip[c.op], c.right, c.left
            else:
                continue
            root = peel(eb)
            gk = (("col", root.key) if isinstance(root, B.BoundColumnRef)
                  else ("id", id(eb)))
            groups.setdefault(gk, []).append((op, ep, eb))
        if not groups:
            return None
        # prefer a group with both an upper bound (op >,>= : build below
        # probe) and a lower bound (op <,<= : build above probe)
        best = None
        for g in groups.values():
            has_up = any(op in (">", ">=") for op, _, _ in g)
            has_lo = any(op in ("<", "<=") for op, _, _ in g)
            if has_up and has_lo:
                best = g
                break
        if best is None:
            best = next(iter(groups.values()))

        # evaluate each condition's two sides and coerce to shared
        # comparable arrays (dates↔timestamps, decimal alignment) with the
        # same rules the comparison operator uses
        m = build_b.plen
        plen = probe_b.plen
        env_b = build_b.env()
        env_p = probe_b.env()
        pairs = []  # (op, probe_arr, build_arr, pc_valid, bc_valid)
        for op, ep, eb2 in best:
            pc = ep.eval(env_p)
            bc2 = eb2.eval(env_b)
            if TypeId.VARCHAR in (pc.ltype.id, bc2.ltype.id):
                return None
            pcf = Column(data=_bdata(pc, plen), ltype=pc.ltype,
                         validity=pc.validity)
            bcf = Column(data=_bdata(bc2, m), ltype=bc2.ltype,
                         validity=bc2.validity)
            try:
                pav, bav = B._common_numeric(pcf, bcf)
            except Exception:  # noqa: BLE001 — unsupported pairing
                return None
            pairs.append((op, pav, bav,
                          _full_valid(pc, plen), _full_valid(bc2, m)))

        # sort ONCE by the group's ROOT column (all conditions are
        # monotone shifts of it, so one order serves every condition —
        # sorting by a TRANSFORMED value instead could break on its ties,
        # e.g. month-adds collapsing distinct dates). Dead build rows sort
        # AFTER every live one via a leading dead flag; the live prefix
        # [0, m_live) is then sorted and dead rows can never enter a
        # candidate range.
        build_ok = build_b.live
        for _, _, _, _, bv in pairs:
            build_ok = jnp.logical_and(build_ok, bv)
        root = peel(best[0][2])
        if isinstance(root, B.BoundColumnRef) and root is not best[0][2]:
            sort_vals = _bdata(root.eval(env_b), m)
        else:
            sort_vals = pairs[0][2]
        dead = jnp.logical_not(build_ok).astype(jnp.int32)
        iota = jnp.arange(m, dtype=jnp.int32)
        _, _, perm = jax.lax.sort([dead, sort_vals, iota], num_keys=2,
                                  is_stable=False)
        m_live = int(jnp.sum(build_ok))

        pos_lo = jnp.zeros((plen,), jnp.int32)
        pos_up = jnp.full((plen,), m_live, jnp.int32)
        probe_ok = probe_b.live
        side = {"<": "right", "<=": "left", ">": "left", ">=": "right"}
        for op, pav, bav, pv, _ in pairs:
            sk_live = bav[perm][:m_live]
            probe_ok = jnp.logical_and(probe_ok, pv)
            pos = jnp.searchsorted(sk_live, pav, side=side[op],
                                   method="sort").astype(jnp.int32)
            if op in (">", ">="):
                pos_up = jnp.minimum(pos_up, pos)  # build at/below probe
            else:
                pos_lo = jnp.maximum(pos_lo, pos)  # build at/above probe
        counts = jnp.where(probe_ok,
                           jnp.maximum(pos_up - pos_lo, 0), 0)

        total = int(jnp.sum(counts, dtype=jnp.int64))
        if total > self.IE_PAIR_CAP:
            from duckdb_tpu.errors import OutOfRangeException
            raise OutOfRangeException(
                f"inequality join would expand {total} candidate pairs "
                f"(cap {self.IE_PAIR_CAP})")
        # full/anti tails must still see NULL-key build rows as live
        # unmatched rows, so the tail gets the batch's own live mask
        return self._expand_tail(node, probe_b, build_b, counts, pos_lo,
                                 perm, probe_ok, build_b.live)

    def _keyless_cross(self, node: P.Join, probe_b, build_b):
        """Keyless join fallback: full cross expansion through the shared
        tail (extra as residual) — supports inner/left/semi/anti/single
        uniformly."""
        m_live = int(jnp.sum(build_b.live))
        cap_b = max(1, pad_bucket(m_live))
        bidx, _ = compact_indices(build_b.live, cap_b)
        counts = jnp.where(probe_b.live, jnp.int32(m_live), 0)
        lo = jnp.zeros((probe_b.plen,), jnp.int32)
        return self._expand_tail(node, probe_b, build_b, counts, lo, bidx,
                                 probe_b.live, build_b.live)

    def _exec_CrossJoin(self, node: P.CrossJoin) -> Batch:
        a = self.execute(node.probe)
        b = self.execute(node.build)
        na, nb = a.count_live(), b.count_live()
        ia, _ = compact_indices(a.live, max(1, pad_bucket(na)))
        ib, _ = compact_indices(b.live, max(1, pad_bucket(nb)))
        total = na * nb
        cap = max(128, pad_bucket(total))
        pos = jnp.arange(cap)
        ra = ia[jnp.clip(pos // max(nb, 1), 0, ia.shape[0] - 1)]
        rb = ib[jnp.clip(pos % max(nb, 1), 0, ib.shape[0] - 1)]
        src = ChainCols([GatherCols(a.src, ra), GatherCols(b.src, rb)])
        return Batch(src=src, plen=cap, live=pos < total)

    # -- aggregation ---------------------------------------------------------
    def _exec_Aggregate(self, node: P.Aggregate) -> Batch:
        from duckdb_tpu.execution.aggregate_exec import execute_aggregate
        from duckdb_tpu.execution.fused_agg import try_fused_aggregate

        try:
            fused = try_fused_aggregate(self, node)
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            fused = None  # host-only function in a filter/arg: general path
        if fused is not None:
            return fused
        child = self.execute(node.child)
        return execute_aggregate(self, child, node)

    def _exec_Window(self, node: P.Window) -> Batch:
        from duckdb_tpu.execution.window_exec import execute_window

        return execute_window(self, node)

    # -- order / limit --------------------------------------------------------
    def _order_norm_keys(self, node: P.Order, b: Batch):
        env = b.env()
        norm = []
        for expr, desc, nulls_first in node.items:
            c = expr.eval(env)
            if nulls_first is None:
                nulls_first = False  # duckdb default NULLS LAST
            validity = c.validity
            data = _bdata(c, b.plen)
            if c.data_hi is not None:
                # wide value: lexicographic (hi, unsigned-low) key pair
                norm.append(S.orderable_int64(
                    jnp.broadcast_to(c.data_hi, (b.plen,)), validity, desc,
                    nulls_first))
                low_u = data.astype(jnp.int64) ^ jnp.int64(_I64_MIN)
                k = S.orderable_int64(low_u, validity, desc, nulls_first)
            elif c.ltype.id is TypeId.VARCHAR:
                data = data.astype(jnp.int64)  # sorted dict → code order = string order
                k = S.orderable_int64(data, validity, desc, nulls_first)
            else:
                k = S.orderable_int64(data, validity, desc, nulls_first)
            norm.append(k)
        return norm

    def _exec_Order(self, node: P.Order) -> Batch:
        b = self.execute(node.child)
        norm = self._order_norm_keys(node, b)
        n_shards = self._join_shards(rows=b.plen)
        if n_shards > 1 and b.plen >= (1 << 14):
            out = self._sharded_order(node, b, norm, n_shards)
            if out is not None:
                return out
        perm = S.sort_permutation(norm, b.live)
        src = GatherCols(b.src, perm)
        # live count stays a device scalar — no host sync
        live = jnp.arange(b.plen) < jnp.sum(b.live)
        return Batch(src=src, plen=b.plen, live=live)

    def _sharded_order(self, node, b, norm, n) -> Optional[Batch]:
        """Distributed ORDER BY (any key count): sample-split range
        partitioning on the primary normalized key + local sorts over the
        full key tuple with global-row-id tiebreak
        (parallel/shard.make_sharded_sort) — bit-identical to the
        single-chip stable sort. Output rows ride shard-major in global
        order with dead gaps at shard tails — downstream compaction
        preserves order. Skew overflow (a range bucket past the capacity)
        grows the capacity to the kernel's own pmax'd bucket demand and
        retries (the MaybeRepartition analog); only degenerate skew — one
        range bucket holding most of the data, where distribution cannot
        help — falls back to single-chip.

        Reference analog: per-thread sorted runs + parallel merge,
        /root/reference/src/common/sort/sorted_run_merger.cpp.
        """
        from duckdb_tpu.parallel.shard import get_sharded_sort

        plen = b.plen
        plen2 = plen + ((-plen) % n)
        learned = getattr(node, "_sort_cap", None)
        cap = learned if learned is not None else 2 * (plen2 // n)
        step = get_sharded_sort(n, cap, nkeys=len(norm))

        def pad(x, m, fill):
            extra = m - x.shape[0]
            if extra == 0:
                return x
            return jnp.concatenate([x, jnp.full((extra,), fill, x.dtype)])

        sent = np.iinfo(np.int64).max
        keys = jnp.stack([pad(k, plen2, sent) for k in norm])
        rows, out_live, overflow, need = step(
            keys,
            pad(b.live, plen2, False),
            jnp.arange(plen2, dtype=jnp.int32))
        if int(overflow) > 0:  # host sync
            new_cap = pad_bucket(int(need))
            if (not getattr(node, "_sort_retried", False)
                    and new_cap <= (plen2 // n) * max(2, n // 2)):
                node._sort_cap = new_cap
                node._sort_retried = True
                try:
                    self._log("INFO", "sharded_sort",
                              f"range-bucket skew: growing cap {cap} -> "
                              f"{new_cap} and retrying")
                    return self._sharded_order(node, b, norm, n)
                finally:
                    node._sort_retried = False
            self._log("WARN", "sharded_sort",
                      f"degenerate range skew at num_shards={n} "
                      f"(bucket demand {int(need)}); sorting single-chip")
            return None
        self._log("INFO", "sharded_sort",
                  f"ORDER BY range-partitioned over {n} shards (cap={cap})")
        # land the mesh-sharded outputs on the default device: downstream
        # operators run single-device eager ops, and every eager op on an
        # N-device array re-enters GSPMD (measured: multi-minute stalls /
        # deadlocks on the CPU backend). One explicit copy instead.
        rows, out_live = _unshard(rows, out_live)
        src = GatherCols(b.src, jnp.clip(rows, 0, plen - 1))
        return Batch(src=src, plen=rows.shape[0], live=out_live)

    def _exec_Limit(self, node: P.Limit) -> Batch:
        if (node.n is not None and isinstance(node.child, P.Order)):
            out = self._sharded_topn(node)
            if out is not None:
                return out
        b = self.execute(node.child)
        if node.n is not None:
            # static capacity from the literal limit — no host sync
            lo = node.offset
            cap = max(128, pad_bucket(min(b.plen, lo + node.n)))
            idx, _ = compact_indices(b.live, min(b.plen, max(1, cap)))
            n_dev = jnp.sum(b.live)
            out = jnp.clip(n_dev - lo, 0, node.n)
            pos = jnp.arange(cap)
            rows = idx[jnp.clip(pos + lo, 0, idx.shape[0] - 1)]
            return Batch(src=GatherCols(b.src, rows), plen=cap,
                         live=pos < out)
        n = b.count_live()
        idx, _ = compact_indices(b.live, max(1, pad_bucket(n)))
        lo = min(node.offset, n)
        hi = n if node.n is None else min(n, lo + node.n)
        out = hi - lo
        cap = max(128, pad_bucket(out))
        pos = jnp.arange(cap)
        rows = idx[jnp.clip(pos + lo, 0, idx.shape[0] - 1)]
        return Batch(src=GatherCols(b.src, rows), plen=cap, live=pos < out)

    def _sharded_topn(self, node: P.Limit) -> Optional[Batch]:
        """Distributed TopN: each shard sorts ITS rows and keeps the top
        (offset+n), the n·k candidates gather to every chip, and one final
        small sort picks the winners — O(rows/n · log) per chip plus one
        k-sized all_gather instead of a full distributed sort. Reference
        analog: per-thread heaps merged at the sink
        (src/execution/operator/order/physical_top_n.cpp)."""
        order = node.child
        k = (node.offset or 0) + node.n
        if k <= 0 or k > (1 << 14):
            return None
        b = self.execute(order.child)
        n_shards = self._join_shards(rows=b.plen)
        if n_shards <= 1 or b.plen < (1 << 15) or b.plen % n_shards:
            return None
        norm = self._order_norm_keys(order, b)
        from duckdb_tpu.parallel.shard import get_sharded_topn

        step = get_sharded_topn(n_shards, min(k, b.plen // n_shards),
                                len(norm))
        cand_keys, cand_rows = step(
            jnp.stack(norm), b.live, jnp.arange(b.plen, dtype=jnp.int32))
        cand_keys, cand_rows = _unshard(cand_keys, cand_rows)
        # final selection among n·k candidates (single device, tiny)
        ops = [cand_keys[i] for i in range(len(norm))] + [cand_rows]
        out = jax.lax.sort(ops, num_keys=len(norm), is_stable=True)
        rows_sorted = out[-1]
        lo = node.offset or 0
        cap = max(128, pad_bucket(node.n))
        pos = jnp.arange(cap)
        total = jnp.minimum(jnp.sum(b.live), rows_sorted.shape[0])
        n_out = jnp.clip(total - lo, 0, node.n)
        rows = rows_sorted[jnp.clip(pos + lo, 0, rows_sorted.shape[0] - 1)]
        self._log("INFO", "sharded_topn",
                  f"TopN(k={k}) over {n_shards} shards: local top-k + "
                  f"candidate merge")
        return Batch(src=GatherCols(b.src, jnp.clip(rows, 0, b.plen - 1)),
                     plen=cap, live=pos < n_out)

    # -- set ops --------------------------------------------------------------
    def _exec_ListPack(self, node: P.ListPack) -> Batch:
        """Zip N evaluated columns into per-row tuples host-side, then
        dict-encode (one deliberate host round trip, like Unnest)."""
        from duckdb_tpu.planner.functions_nested import encode_objects

        b = self.execute(node.child)
        env = b.env()
        ct = node.ltype.child
        mats = []
        for e in node.exprs:
            c = e.eval(env)
            data = np.asarray(jnp.broadcast_to(c.data, (b.plen,)))
            valid = (np.asarray(jnp.broadcast_to(c.validity, (b.plen,)))
                     if c.validity is not None else None)
            mats.append((data, valid, c.dict_values, c.ltype))
        live = np.asarray(b.live)

        def pyval(mi, i):
            data, valid, dvals, lt = mats[mi]
            if valid is not None and not valid[i]:
                return None
            v = data[i]
            if lt.id is TypeId.VARCHAR:
                return str(dvals[v])
            if lt.id in (TypeId.LIST, TypeId.STRUCT):
                return tuple(dvals[v])
            if lt.is_float:
                return float(v)
            if lt.id is TypeId.BOOLEAN:
                return bool(v)
            return int(v)

        entries = [tuple(pyval(mi, i) for mi in range(len(mats)))
                   if live[i] else () for i in range(b.plen)]
        codes, dvals = encode_objects(entries)
        col = Column(data=jnp.asarray(codes), ltype=node.ltype,
                     dict_values=dvals)
        return Batch(src=ChainCols([DictCols({node.key: col}), b.src]),
                     plen=b.plen, live=b.live)

    def _exec_Unnest(self, node: P.Unnest) -> Batch:
        """Flatten the dict-encoded list column host-side: element counts are
        data-dependent, so this is one deliberate host round trip; sibling
        columns stay device-resident and replicate via a GatherCols index
        plane (reference: physical_unnest.cpp row expansion)."""
        from duckdb_tpu.planner.functions_nested import _column_from_pyvals

        b = self.execute(node.child)
        env = b.env()
        live = np.asarray(b.live)
        mats = []
        for e in node.exprs:
            c = e.eval(env)
            codes = np.asarray(jnp.broadcast_to(c.data, (b.plen,)))
            cvalid = (np.asarray(jnp.broadcast_to(c.validity, (b.plen,)))
                      if c.validity is not None else None)
            mats.append((c.ltype.child, codes, cvalid, c.dict_values))
        rows_idx = []
        per_key_vals = [[] for _ in node.keys]
        for i in range(b.plen):
            if not live[i]:
                continue
            lens = []
            for _, codes, cvalid, dvals in mats:
                if cvalid is not None and not cvalid[i]:
                    lens.append(0)
                else:
                    lens.append(len(dvals[codes[i]]))
            m = max(lens) if lens else 0
            # multiple unnests zip by position, shorter lists NULL-pad
            for j in range(m):
                rows_idx.append(i)
                for kk, (_, codes, cvalid, dvals) in enumerate(mats):
                    t_ = (dvals[codes[i]]
                          if not (cvalid is not None and not cvalid[i])
                          else ())
                    per_key_vals[kk].append(t_[j] if j < len(t_) else None)
        n = len(rows_idx)
        cap = max(128, pad_bucket(n))
        idx = np.zeros(cap, dtype=np.int32)
        idx[:n] = rows_idx
        new_live = jnp.arange(cap) < n
        cols = {}
        for key, (ct, _, _, _), vals in zip(node.keys, mats, per_key_vals):
            data, valid, vdict = _column_from_pyvals(vals, ct)
            pdata = np.zeros(cap, dtype=data.dtype)
            pdata[:n] = data
            pvalid = np.zeros(cap, dtype=bool)
            pvalid[:n] = valid
            cols[key] = Column(data=jnp.asarray(pdata), ltype=ct,
                               validity=jnp.asarray(pvalid),
                               dict_values=vdict)
        src = ChainCols([DictCols(cols), GatherCols(b.src,
                                                    jnp.asarray(idx))])
        return Batch(src=src, plen=cap, live=new_live)

    def _exec_PositionalJoin(self, node: P.PositionalJoin) -> Batch:
        a = self.execute(node.left)
        b = self.execute(node.right)
        na, nb = a.count_live(), b.count_live()
        n = max(na, nb)
        cap = max(128, pad_bucket(n))
        ia, _ = compact_indices(a.live, cap)
        ib, _ = compact_indices(b.live, cap)
        pos = jnp.arange(cap)
        src = ChainCols([
            GatherCols(a.src, ia.astype(jnp.int32), null_rows=pos >= na),
            GatherCols(b.src, ib.astype(jnp.int32), null_rows=pos >= nb),
        ])
        return Batch(src=src, plen=cap, live=pos < n)

    def _exec_Sample(self, node: P.Sample) -> Batch:
        """Narrow the live mask pseudo-randomly; block shape is preserved so
        downstream stages recompile nothing (reference materializes a
        reservoir, src/execution/operator/helper/physical_reservoir_sample
        .cpp — here a sample is just another mask)."""
        import random as _random

        b = self.execute(node.child)
        seed = node.seed if node.seed is not None else _random.randrange(1 << 30)
        key = jax.random.PRNGKey(seed)
        r = jax.random.uniform(key, (b.plen,))
        if node.percent is not None:
            keep = jnp.logical_and(b.live, r < node.percent / 100.0)
        else:
            dead = jnp.logical_not(b.live)
            ops = jax.lax.sort(
                [dead, r, jnp.arange(b.plen, dtype=jnp.int32)], num_keys=2)
            sel = ops[2][: max(node.rows, 0)]
            keep = jnp.zeros((b.plen,), jnp.bool_).at[sel].set(True)
            keep = jnp.logical_and(keep, b.live)
        return Batch(src=b.src, plen=b.plen, live=keep)

    def _exec_SetOp(self, node: P.SetOp) -> Batch:
        assert node.op == "union_all"
        a = self.execute(node.left)
        b = self.execute(node.right)
        na, nb = a.count_live(), b.count_live()
        ia, _ = compact_indices(a.live, max(1, pad_bucket(na)))
        ib, _ = compact_indices(b.live, max(1, pad_bucket(nb)))
        cap = max(128, pad_bucket(na + nb))
        cols = {}
        for key, t in node.keys:
            ca, cb = a.src[key], b.src[key]
            da = _bdata(ca, a.plen)[ia][:na]
            db = _bdata(cb, b.plen)[ib][:nb]
            va = _full_valid(ca, a.plen)[ia][:na]
            vb = _full_valid(cb, b.plen)[ib][:nb]
            dvals = None
            if t.id is TypeId.VARCHAR:
                from duckdb_tpu.planner.bound import _varchar_rank_luts

                la, lb = _varchar_rank_luts(ca, cb)
                dvals = np.union1d(ca.dict_values, cb.dict_values).astype(object)
                da = la[jnp.clip(da, 0, len(la) - 1)]
                db = lb[jnp.clip(db, 0, len(lb) - 1)]
            elif t.id in (TypeId.LIST, TypeId.STRUCT, TypeId.MAP,
                          TypeId.BLOB, TypeId.BIT, TypeId.UNION,
                          TypeId.ARRAY):
                # object-dict types: concatenate dictionaries (b's codes
                # shift past a's entries; no dedup needed for correctness)
                dla = (list(ca.dict_values)
                       if ca.dict_values is not None else [])
                dlb = (list(cb.dict_values)
                       if cb.dict_values is not None else [])
                dvals = np.empty(max(len(dla) + len(dlb), 1), object)
                for i, e in enumerate(dla + dlb):
                    dvals[i] = e
                db = db + len(dla)
            data = jnp.zeros((cap,), da.dtype)
            data = data.at[:na].set(da).at[na:na + nb].set(db.astype(da.dtype))
            valid = jnp.zeros((cap,), jnp.bool_)
            valid = valid.at[:na].set(va).at[na:na + nb].set(vb)
            cols[key] = Column(data=data, ltype=t, validity=valid,
                               dict_values=dvals)
        live = jnp.arange(cap) < (na + nb)
        return Batch(src=DictCols(cols), plen=cap, live=live)

    def _exec__ConstantRow(self, node) -> Batch:
        live = jnp.zeros((128,), jnp.bool_).at[0].set(True)
        return Batch(src=DictCols({}), plen=128, live=live)
