"""Window function execution.

The reference's window engine hash-partitions + sorts, then runs
per-partition executors with segment trees for running aggregates
(/root/reference/src/function/window/, src/common/sort/hashed_sort.cpp).
The TPU shape: ONE multi-operand `lax.sort` orders the whole block by
(partition keys, order keys); every window function is then a composition
of segmented prefix scans (cumsum/cummax over run boundaries) — fully
data-parallel, no per-partition loops — and results scatter back through
the sort permutation.

Frames: default frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW with peers
when ORDER BY present, whole partition otherwise) plus explicit ROWS and
RANGE BETWEEN frames with offsets. Every frame reduces to per-row
[lo_pos, hi_pos] index spans in sorted order: ROWS offsets are index
arithmetic, RANGE offsets are vectorized binary searches on the order key
(log2(n) gather rounds inside one jit — the TPU analog of the reference's
per-row PeerBegin/PeerEnd scans). Sums over spans use prefix-sum
differences; min/max uses a log-level sparse table (two gathers per row).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_tpu.blocks import Column
from duckdb_tpu.ops import sort as S
from duckdb_tpu.ops.scan import jit_ascan
from duckdb_tpu.planner import plan as P
from duckdb_tpu.types import BIGINT, DOUBLE, TypeId

_I64_MAX = np.iinfo(np.int64).max
_I64_MIN = np.iinfo(np.int64).min


def _propagate_from_start(vals, seg_start):
    """Broadcast the value at each segment start across the segment."""
    idx = jnp.arange(vals.shape[0])
    start_idx = jax.lax.cummax(jnp.where(seg_start, idx, 0))
    return vals[start_idx], start_idx


def execute_window(executor, node: P.Window):
    from duckdb_tpu.execution.executor import (
        Batch, ChainCols, DictCols, GatherCols, _bdata, _full_valid,
    )

    b = executor.execute(node.child)
    plen = b.plen
    env = b.env()
    out_cols = {}

    # group windows by (partition, order) signature → share one sort
    for w in node.windows:
        pkeys = []
        for e in w.partition_by:
            c = e.eval(env)
            pkeys.append(S.orderable_int64(
                _bdata(c, plen).astype(jnp.int64)
                if c.ltype.id is TypeId.VARCHAR else _bdata(c, plen),
                c.validity, False, True))
        dist = _try_sharded_window(executor, w, env, b, pkeys)
        if dist is not None:
            out_cols[w.key] = dist
            continue
        okeys = []
        for e, desc, nf in w.order_by:
            c = e.eval(env)
            if nf is None:
                nf = False
            okeys.append(S.orderable_int64(
                _bdata(c, plen).astype(jnp.int64)
                if c.ltype.id is TypeId.VARCHAR else _bdata(c, plen),
                c.validity, desc, nf))
        iota = jnp.arange(plen, dtype=jnp.int32)
        operands = [jnp.logical_not(b.live)] + pkeys + okeys + [iota]
        sorted_ops = jax.lax.sort(operands, num_keys=len(operands) - 1,
                                  is_stable=True)
        dead_s = sorted_ops[0]
        perm = sorted_ops[-1]
        pk_s = sorted_ops[1:1 + len(pkeys)]
        ok_s = sorted_ops[1 + len(pkeys):-1]

        # partition boundaries (first row of each partition), in sorted order.
        # dead padding rows (sorted last) get their own segment so value-based
        # frame bisection never scans their garbage order keys
        seg_start = jnp.zeros((plen,), jnp.bool_).at[0].set(True)
        seg_start = jnp.logical_or(seg_start,
                                   dead_s != jnp.roll(dead_s, 1))
        for k in pk_s:
            seg_start = jnp.logical_or(seg_start, k != jnp.roll(k, 1))
        seg_start = seg_start.at[0].set(True)
        # peer boundaries (order-key change within partition)
        peer_start = seg_start
        for k in ok_s:
            peer_start = jnp.logical_or(peer_start, k != jnp.roll(k, 1))
        peer_start = peer_start.at[0].set(True)

        res_sorted, res_valid_sorted = _compute_window(
            w, env, plen, perm, seg_start, peer_start, bool(len(ok_s)), b)
        # scatter back to row order
        data = jnp.zeros((plen,), res_sorted.dtype).at[perm].set(res_sorted)
        validity = None
        if res_valid_sorted is not None:
            validity = jnp.zeros((plen,), jnp.bool_).at[perm].set(res_valid_sorted)
        dict_vals = None
        if w.ltype.id is TypeId.VARCHAR and w.args:
            c0 = w.args[0].eval(env)
            dict_vals = c0.dict_values
        out_cols[w.key] = Column(data=data, ltype=w.ltype, validity=validity,
                                 dict_values=dict_vals)

    return Batch(src=ChainCols([DictCols(out_cols), b.src]), plen=plen,
                 live=b.live)


_SHARDED_WINDOW_FNS = {"row_number", "rank", "dense_rank", "count", "sum",
                       "avg", "min", "max"}
_SHARDED_MIN_ROWS = 1 << 14


def _try_sharded_window(executor, w: P.BoundWindow, env, b, pkeys):
    """Distributed window via hash-partition exchange + local segmented
    kernel (parallel/shard.make_sharded_window; reference strategy:
    src/common/sort/hashed_sort.cpp). Covers the analytic core —
    ranking functions and default-frame aggregates — over PARTITION BY
    windows; anything else stays on the single-chip path."""
    from duckdb_tpu.execution.executor import _bdata, _full_valid

    plen = b.plen
    n = executor._join_shards(rows=plen)
    if (n <= 1 or plen < _SHARDED_MIN_ROWS or not pkeys
            or w.frame is not None
            or w.func not in _SHARDED_WINDOW_FNS or len(w.args) > 1):
        return None
    if w.func in ("min", "max") and w.order_by:
        return None  # running min/max not in the exchange kernel yet
    running = bool(w.order_by)
    okeys = []
    for e, desc, nf in w.order_by:
        c = e.eval(env)
        okeys.append(S.orderable_int64(
            _bdata(c, plen).astype(jnp.int64)
            if c.ltype.id is TypeId.VARCHAR else _bdata(c, plen),
            c.validity, desc, False if nf is None else nf))
    if w.args:
        ca = w.args[0].eval(env)
        if ca.ltype.id is TypeId.VARCHAR or ca.data_hi is not None:
            return None
        if ca.ltype.is_float:
            arg = _bdata(ca, plen).astype(jnp.float64)
        else:
            arg = _bdata(ca, plen).astype(jnp.int64)
        argv = _full_valid(ca, plen)
    else:
        arg = jnp.ones((plen,), jnp.int64)
        argv = jnp.ones((plen,), jnp.bool_)
    from duckdb_tpu.parallel.shard import get_sharded_window

    plen2 = plen + ((-plen) % n)
    cap = 2 * (plen2 // n)
    step = get_sharded_window(n, cap, len(pkeys), len(okeys), w.func,
                              running)

    def pad(x, fill):
        extra = plen2 - x.shape[0]
        if extra == 0:
            return x
        return jnp.concatenate([x, jnp.full((extra,), fill, x.dtype)])

    rows_out, val, valid, overflow, need = step(
        pad(pkeys[0], jnp.iinfo(jnp.int64).max),
        pad(b.live, False),
        jnp.arange(plen2, dtype=jnp.int32),
        *pkeys, *okeys, arg, argv)
    if int(overflow) > 0:  # host sync; skew → single-chip fallback
        return None
    from duckdb_tpu.execution.executor import _unshard

    rows_out, val, valid = _unshard(rows_out, val, valid)
    executor._log("INFO", "sharded_window",
                  f"window {w.func} hash-partitioned over {n} shards "
                  f"(cap={cap})")
    # scatter values back by global row id (drop dead / padding rows)
    ok = jnp.logical_and(rows_out >= 0, rows_out < plen)
    flat = jnp.where(ok, rows_out, plen)
    dt = jnp.float64 if val.dtype == jnp.float64 else jnp.int64
    if (w.func == "avg" and w.args
            and w.args[0].ltype.id is TypeId.DECIMAL):
        # kernel averaged the SCALED integers; undo the decimal scale
        val = val.astype(jnp.float64) / (10.0 ** w.args[0].ltype.scale)
        dt = jnp.float64
    data = jnp.zeros((plen + 1,), dt).at[flat].set(
        val.astype(dt), mode="drop")[:plen]
    validity = jnp.zeros((plen + 1,), jnp.bool_).at[flat].set(
        valid, mode="drop")[:plen]
    from duckdb_tpu.blocks import Column

    return Column(data=data, ltype=w.ltype, validity=validity)


def _compute_window(w: P.BoundWindow, env, plen, perm, seg_start, peer_start,
                    has_order, b):
    """→ (values in sorted order, validity in sorted order | None)."""
    from duckdb_tpu.execution.executor import _bdata, _full_valid

    idx = jnp.arange(plen, dtype=jnp.int64)
    _, start_idx = _propagate_from_start(idx, seg_start)
    pos_in_seg = idx - start_idx  # 0-based row number within partition

    f = w.func
    if f == "row_number":
        return pos_in_seg + 1, None
    if f == "rank":
        _, peer_idx = _propagate_from_start(idx, peer_start)
        return peer_idx - start_idx + 1, None
    if f == "dense_rank":
        # count of peer-run starts since the segment start
        ps = jnp.cumsum(peer_start.astype(jnp.int64))
        seg_ps, _ = _propagate_from_start(ps, seg_start)
        return ps - seg_ps + 1, None
    if f in ("percent_rank", "cume_dist"):
        _, seg_s, seg_e = _seg_bounds(seg_start, plen)
        size = (seg_e - seg_s + 1).astype(jnp.float64)
        if f == "percent_rank":
            _, peer_idx = _propagate_from_start(idx, peer_start)
            rk = (peer_idx - seg_s).astype(jnp.float64)
            return jnp.where(size > 1, rk / jnp.maximum(size - 1, 1.0),
                             0.0), None
        # cume_dist: rows up to and including the current peer group
        nxtp = jnp.roll(peer_start, -1).at[-1].set(True)
        revp = jnp.where(nxtp, idx, jnp.int64(_I64_MAX))[::-1]
        peer_e = jax.lax.cummin(revp)[::-1]
        return (peer_e - seg_s + 1).astype(jnp.float64) / size, None
    if f == "ntile":
        n = int(w.args[0].const_value())
        # partition size: propagate from start of NEXT segment... compute via
        # total positions: size = (next_start - start); next_start via reverse
        rev = seg_start[::-1]
        _, rev_start = _propagate_from_start(jnp.arange(plen, dtype=jnp.int64),
                                             jnp.roll(rev, 1).at[0].set(True))
        seg_end = (plen - 1) - rev_start[::-1]  # last index of segment
        size = seg_end - start_idx + 1
        k = pos_in_seg
        base = size // n
        rem = size % n
        big = jnp.minimum(k // jnp.maximum(base + 1, 1), rem)
        tile = jnp.where(k < rem * (base + 1),
                         k // jnp.maximum(base + 1, 1),
                         rem + (k - rem * (base + 1)) // jnp.maximum(base, 1))
        return tile + 1, None

    # value-based functions need the argument in sorted order
    if w.args:
        c = w.args[0].eval(env)
        vals = _bdata(c, plen)[perm]
        valid = (_full_valid(c, plen)[perm] if c.validity is not None
                 else jnp.ones((plen,), jnp.bool_))
    else:
        c = None
        vals = jnp.zeros((plen,), jnp.int64)
        valid = jnp.ones((plen,), jnp.bool_)
    live_s = b.live[perm]
    valid = jnp.logical_and(valid, live_s)

    if f == "fill":
        # interpolate NULLs from the nearest valid neighbors within the
        # partition (reference: FillFun,
        # src/include/duckdb/function/window/value_functions.hpp:69)
        vidx = jnp.where(valid, idx, jnp.int64(-1))
        # reset at segment starts: max-scan of (segment-start marker, vidx)
        seg_floor = jax.lax.cummax(jnp.where(seg_start, idx, 0))
        prev_i = jax.lax.cummax(vidx)
        prev_i = jnp.where(prev_i >= seg_floor, prev_i, -1)
        nvidx = jnp.where(valid, idx, jnp.int64(_I64_MAX))[::-1]
        next_i = jax.lax.cummin(nvidx)[::-1]
        # segment end = start of next segment - 1
        rev = seg_start[::-1]
        rev_floor = jax.lax.cummax(
            jnp.where(jnp.roll(rev, 1).at[0].set(True),
                      jnp.arange(plen, dtype=jnp.int64), 0))
        seg_end = (plen - 1) - rev_floor[::-1]
        next_i = jnp.where(next_i <= seg_end, next_i, _I64_MAX)
        has_p = prev_i >= 0
        has_n = next_i < _I64_MAX
        pc = jnp.clip(prev_i, 0, plen - 1)
        nc = jnp.clip(next_i, 0, plen - 1)
        pv = vals[pc].astype(jnp.float64)
        nv = vals[nc].astype(jnp.float64)
        span = jnp.maximum((next_i - prev_i).astype(jnp.float64), 1.0)
        interp = pv + (nv - pv) * ((idx - prev_i).astype(jnp.float64) / span)
        filled = jnp.where(jnp.logical_and(has_p, has_n), interp,
                           jnp.where(has_p, pv, nv))
        out = jnp.where(valid, vals,
                        filled.astype(vals.dtype) if vals.dtype
                        != jnp.float64 else filled)
        return out, jnp.logical_or(valid, jnp.logical_or(has_p, has_n))

    if f in ("lag", "lead"):
        off = int(w.args[1].const_value()) if len(w.args) > 1 else 1
        shift = -off if f == "lag" else off
        src = idx + shift
        in_range = jnp.logical_and(src >= 0, src < plen)
        srcc = jnp.clip(src, 0, plen - 1)
        same_seg = start_idx[srcc] == start_idx
        ok = jnp.logical_and(in_range, same_seg)
        out = jnp.where(ok, vals[srcc], 0)
        outv = jnp.logical_and(ok, valid[srcc])
        if len(w.args) > 2:  # default value
            dflt = w.args[2].eval(env)
            dv = _bdata(dflt, plen)[perm]
            out = jnp.where(ok, out, dv)
            outv = jnp.where(ok, outv, True)
        return out, outv
    framed = w.frame is not None
    if framed:
        lo_pos, hi_pos = _frame_bounds(w, env, perm, seg_start, peer_start,
                                       plen)
        nonempty = hi_pos >= lo_pos

    if f == "nth_value":
        n = int(w.args[1].const_value())
        _, seg_s, seg_e = _seg_bounds(seg_start, plen)
        if framed:
            p_ = lo_pos + n - 1
            limit = hi_pos
        else:
            p_ = seg_s + n - 1
            if has_order:
                nxtp = jnp.roll(peer_start, -1).at[-1].set(True)
                revp = jnp.where(nxtp, idx, jnp.int64(_I64_MAX))[::-1]
                limit = jax.lax.cummin(revp)[::-1]
            else:
                limit = seg_e
        ok = jnp.logical_and(n >= 1, p_ <= limit)
        pc = jnp.clip(p_, 0, plen - 1)
        return vals[pc], jnp.logical_and(ok, valid[pc])
    if f == "first_value":
        if framed:
            fv = vals[jnp.clip(lo_pos, 0, plen - 1)]
            fvv = jnp.logical_and(nonempty,
                                  valid[jnp.clip(lo_pos, 0, plen - 1)])
            return fv, fvv
        fv, _ = _propagate_from_start(vals, seg_start)
        fvv, _ = _propagate_from_start(valid, seg_start)
        return fv, fvv
    if f == "last_value":
        if framed:
            lv = vals[jnp.clip(hi_pos, 0, plen - 1)]
            lvv = jnp.logical_and(nonempty,
                                  valid[jnp.clip(hi_pos, 0, plen - 1)])
            return lv, lvv
        # default frame ends at current row (peers included when ordered)
        if has_order:
            return _peer_end_gather(vals, peer_start, plen), \
                _peer_end_gather(valid, peer_start, plen)
        return _seg_end_gather(vals, seg_start, plen), \
            _seg_end_gather(valid, seg_start, plen)

    if f in ("stddev", "stddev_samp", "stddev_pop", "var_samp", "var_pop",
             "variance"):
        # whole-partition moments via segment sums (ordered running
        # variance lands with frame-aware holistics in round 2)
        x = jnp.where(valid, vals.astype(jnp.float64), 0.0)
        n_ = _seg_total(valid.astype(jnp.int64), seg_start, plen
                        ).astype(jnp.float64)
        sx = _seg_total(x, seg_start, plen)
        mean = sx / jnp.maximum(n_, 1.0)
        # two-pass centered sum: numerically matches the reference's
        # incremental accumulation to the last ulp on typical data
        d = jnp.where(valid, vals.astype(jnp.float64) - mean, 0.0)
        m2 = _seg_total(d * d, seg_start, plen)
        if f in ("stddev_pop", "var_pop"):
            var = m2 / jnp.maximum(n_, 1.0)
            ok = n_ >= 1
        else:
            var = m2 / jnp.maximum(n_ - 1.0, 1.0)
            ok = n_ >= 2
        var = jnp.maximum(var, 0.0)
        out = var if f.startswith("var") else jnp.sqrt(var)
        return out, ok
    if f in ("median", "quantile_cont"):
        # second sort by (partition, value): per-row gather at the
        # interpolated mid positions of each live segment
        q = 0.5
        if f == "quantile_cont" and len(w.args) > 1:
            q = float(w.args[1].const_value())
        xkey = S.orderable_int64(vals, valid, False, False)
        iota = jnp.arange(plen, dtype=jnp.int32)
        seg_id = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
        out2 = jax.lax.sort(
            [seg_id, jnp.logical_not(valid), xkey,
             vals.astype(jnp.float64), iota], num_keys=3)
        vals2 = out2[3]
        idx2, s2, _e2 = _seg_bounds(seg_start, plen)
        nval = _seg_total(valid.astype(jnp.int64), seg_start, plen)
        pos = (nval.astype(jnp.float64) - 1.0) * q
        lo = jnp.floor(pos).astype(jnp.int64)
        hi = jnp.ceil(pos).astype(jnp.int64)
        frac = pos - lo.astype(jnp.float64)
        vlo = vals2[jnp.clip(s2 + lo, 0, plen - 1)]
        vhi = vals2[jnp.clip(s2 + hi, 0, plen - 1)]
        med = vlo * (1.0 - frac) + vhi * frac
        if c is not None and c.ltype.id is TypeId.DECIMAL:
            med = med / (10.0 ** c.ltype.scale)
        return med, nval > 0

    # running / framed aggregates: sum, count, avg, min, max
    is_float = c is not None and (c.ltype.is_float or f in ("avg",))
    if f in ("sum", "avg", "count"):
        if f == "count":
            x = valid.astype(jnp.int64)
        elif c.ltype.is_float:
            x = jnp.where(valid, vals.astype(jnp.float64), 0.0)
        else:
            x = jnp.where(valid, vals.astype(jnp.int64), 0)
        cnt = valid.astype(jnp.int64)
        if framed:
            s = _span_sum(x, lo_pos, hi_pos, seg_start, plen)
            n_ = _span_sum(cnt, lo_pos, hi_pos, seg_start, plen)
        elif has_order:
            s = _running_sum(x, seg_start, peer_start, plen)
            n_ = _running_sum(cnt, seg_start, peer_start, plen)
        else:
            s = _seg_total(x, seg_start, plen)
            n_ = _seg_total(cnt, seg_start, plen)
        if f == "count":
            return s, None
        if f == "sum":
            if c.ltype.is_float:
                return s, n_ > 0
            return s, n_ > 0
        # avg
        if c.ltype.id is TypeId.DECIMAL:
            d = s.astype(jnp.float64) / (n_.astype(jnp.float64)
                                         * (10.0 ** c.ltype.scale))
        else:
            d = s.astype(jnp.float64) / n_.astype(jnp.float64)
        return d, n_ > 0
    if f in ("min", "max"):
        if c.ltype.is_float:
            sent = jnp.inf if f == "min" else -jnp.inf
            x = jnp.where(valid, vals.astype(jnp.float64), sent)
        else:
            sent = _I64_MAX if f == "min" else _I64_MIN
            x = jnp.where(valid, vals.astype(jnp.int64), sent)
        op = jnp.minimum if f == "min" else jnp.maximum
        if framed:
            run = _span_minmax(x, lo_pos, hi_pos, op, sent, plen)
            nvalid = _span_sum(valid.astype(jnp.int64), lo_pos, hi_pos,
                               seg_start, plen)
        elif has_order:
            # running min/max: segmented scan
            run = jit_ascan("seg_" + op.__name__,
                            _segmented_combine(op), (x, seg_start))[0]
            run = _peer_end_gather(run, peer_start, plen)
            nvalid = _running_sum(valid.astype(jnp.int64), seg_start,
                                  peer_start, plen)
        else:
            run = _seg_total_minmax(x, seg_start, plen, op)
            nvalid = _seg_total(valid.astype(jnp.int64), seg_start, plen)
        return run.astype(vals.dtype), nvalid > 0
    raise NotImplementedError(f"window function {f}")


def _segmented_combine(op):
    def comb(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, op(av, bv)), jnp.logical_or(af, bf))
    return comb


def _running_sum(x, seg_start, peer_start, plen):
    """RANGE UNBOUNDED PRECEDING..CURRENT ROW including peers."""
    ps = jit_ascan("seg_add", _segmented_combine(jnp.add), (x, seg_start))[0]
    return _peer_end_gather(ps, peer_start, plen)


def _seg_total(x, seg_start, plen):
    ps = jit_ascan("seg_add", _segmented_combine(jnp.add), (x, seg_start))[0]
    return _seg_end_gather(ps, seg_start, plen)


def _seg_total_minmax(x, seg_start, plen, op):
    ps = jit_ascan("seg_" + op.__name__, _segmented_combine(op), (x, seg_start))[0]
    return _seg_end_gather(ps, seg_start, plen)


def _seg_end_gather(ps, seg_start, plen):
    """Gather the value at each segment's last row."""
    idx = jnp.arange(plen, dtype=jnp.int64)
    nxt = jnp.roll(seg_start, -1).at[-1].set(True)  # last row of each segment
    rev_vals = jnp.where(nxt, idx, jnp.int64(_I64_MAX))[::-1]
    end_idx = jax.lax.cummin(rev_vals)[::-1]
    return ps[jnp.clip(end_idx, 0, plen - 1)]


def _peer_end_gather(ps, peer_start, plen):
    """Gather the value at the last row of each peer run."""
    nxt = jnp.roll(peer_start, -1).at[-1].set(True)
    idx = jnp.arange(plen, dtype=jnp.int64)
    rev_vals = jnp.where(nxt, idx, jnp.int64(_I64_MAX))[::-1]
    end_idx = jax.lax.cummin(rev_vals)[::-1]
    return ps[jnp.clip(end_idx, 0, plen - 1)]


def _seg_bounds(seg_start, plen):
    """→ (idx, first index of each row's segment, last index)."""
    idx = jnp.arange(plen, dtype=jnp.int64)
    _, start_idx = _propagate_from_start(idx, seg_start)
    nxt = jnp.roll(seg_start, -1).at[-1].set(True)
    rev_vals = jnp.where(nxt, idx, jnp.int64(_I64_MAX))[::-1]
    end_idx = jax.lax.cummin(rev_vals)[::-1]
    return idx, start_idx, end_idx


def _bisect(keys, targets, lo0, hi0, right, plen):
    """Vectorized per-row binary search: first index in [lo0, hi0] where
    keys[j] >= target (or > target when right=True). keys ascend within each
    row's [lo0, hi0] span. log2(n) rounds of one gather each."""
    iters = max(1, int(np.ceil(np.log2(max(2, plen)))) + 1)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        kv = keys[jnp.clip(mid, 0, plen - 1)]
        go = jnp.logical_and(lo < hi,
                             (kv <= targets) if right else (kv < targets))
        return (jnp.where(go, mid + 1, lo),
                jnp.where(go, hi, jnp.where(lo < hi, mid, hi)))

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
    return lo


def _frame_bounds(w, env, perm, seg_start, peer_start, plen):
    """Explicit ROWS/RANGE frame → per-row inclusive [lo_pos, hi_pos] index
    spans in sorted order (reference: src/function/window/window_boundaries
    _state.cpp bound computation)."""
    from duckdb_tpu.execution.executor import _bdata, _full_valid

    mode, lo, hi = w.frame
    idx, start_idx, end_idx = _seg_bounds(seg_start, plen)

    if mode == "rows":
        def pos(spec):
            kind, e = spec
            if kind == "unbounded_preceding":
                return start_idx
            if kind == "unbounded_following":
                return end_idx
            if kind == "current":
                return idx
            n = int(_const_frame(e))
            return idx - n if kind == "preceding" else idx + n

        lo_pos, hi_pos = pos(lo), pos(hi)
    else:  # range with offsets: value-space bounds on the single order key
        if len(w.order_by) != 1:
            raise ValueError(
                "RANGE frames with offsets require exactly one ORDER BY "
                "expression")
        e, desc, _nf = w.order_by[0]
        c = e.eval(env)
        kv = _bdata(c, plen)[perm]
        kvalid = (_full_valid(c, plen)[perm] if c.validity is not None
                  else jnp.ones((plen,), jnp.bool_))
        if c.ltype.is_float:
            k = kv.astype(jnp.float64)
        else:
            k = kv.astype(jnp.int64)
        if desc:  # negate so keys ascend; offsets are direction-symmetric
            k = -k
        # NULL keys hold garbage raw values; pin them to a sentinel matching
        # their physical sort placement so the array stays ascending
        nulls_first = bool(_nf) if _nf is not None else False
        if c.ltype.is_float:
            sent_null = -jnp.inf if nulls_first else jnp.inf
        else:
            sent_null = _I64_MIN if nulls_first else _I64_MAX
        k = jnp.where(kvalid, k, sent_null)
        scale = 10 ** c.ltype.scale if c.ltype.id is TypeId.DECIMAL else 1

        def off(e_):
            from decimal import Decimal

            be = _bound_frame_expr(e_)
            v = be.const_value()
            lt = getattr(be, "ltype", None)
            if lt is not None and getattr(lt, "id", None) is TypeId.INTERVAL:
                return ("interval", v)  # (months, days, micros)
            if lt is not None and getattr(lt, "id", None) is TypeId.DECIMAL:
                v = Decimal(v).scaleb(-lt.scale)  # const_value is scaled int
            if c.ltype.is_float:
                return float(v)
            return int(Decimal(str(v)) * scale)

        def shift_interval(keys, iv, sign):
            """Vectorised calendar shift of the order key by ±interval.

            Matches the reference's per-row `order_key - INTERVAL` bound
            (src/function/window/window_boundaries_state.cpp): exact civil
            month arithmetic with end-of-month clamping, not 30-day months.
            `keys` are int64 days (DATE) or micros (TIMESTAMP), possibly
            negated for DESC — undo the negation, shift, re-negate.
            """
            from duckdb_tpu.planner.functions import civil_from_days
            from duckdb_tpu.planner.functions_ext import _civil_to_days

            mo, dd, us = iv
            if c.ltype.id not in (TypeId.DATE, TypeId.TIMESTAMP):
                raise ValueError(
                    "INTERVAL RANGE offsets require a DATE or TIMESTAMP "
                    "ORDER BY key")
            kk2 = -keys if desc else keys
            is_ts = c.ltype.id is TypeId.TIMESTAMP
            days = kk2 // 86_400_000_000 if is_ts else kk2
            tod = kk2 - days * 86_400_000_000 if is_ts else None
            if mo:
                y, m, d = civil_from_days(days.astype(jnp.int64))
                t = (y * 12 + (m - 1)) + sign * mo
                y2, m2 = t // 12, t % 12 + 1
                # clamp day to the target month's length
                mdays = jnp.asarray(
                    [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                    dtype=jnp.int64)[m2 - 1]
                leap = ((y2 % 4 == 0) & ((y2 % 100 != 0) | (y2 % 400 == 0))
                        ) & (m2 == 2)
                mdays = mdays + leap.astype(jnp.int64)
                d2 = jnp.minimum(d, mdays)
                days = _civil_to_days(y2, m2, d2)
            days = days + sign * dd
            out = days * 86_400_000_000 + tod + sign * us if is_ts \
                else days + sign * (us // 86_400_000_000)
            return -out if desc else out

        # peer-run bounds: the CURRENT ROW frame edge in RANGE mode, and the
        # frame for NULL order keys (all NULLs are mutual peers)
        _, peer_s = _propagate_from_start(idx, peer_start)
        nxtp = jnp.roll(peer_start, -1).at[-1].set(True)
        revp = jnp.where(nxtp, idx, jnp.int64(_I64_MAX))[::-1]
        peer_e = jax.lax.cummin(revp)[::-1]

        def pos(spec, is_lo):
            kind, e_ = spec
            if kind == "unbounded_preceding":
                return start_idx
            if kind == "unbounded_following":
                return end_idx
            if kind == "current":
                return peer_s if is_lo else peer_e
            n = off(e_)
            if isinstance(n, tuple) and n[0] == "interval":
                sign = -1 if kind == "preceding" else 1
                tgt = shift_interval(k, n[1], sign)
            else:
                tgt = k - n if kind == "preceding" else k + n
            if is_lo:
                p = _bisect(k, tgt, start_idx, end_idx + 1, False, plen)
            else:
                p = _bisect(k, tgt, start_idx, end_idx + 1, True, plen) - 1
            return jnp.where(kvalid, p, peer_s if is_lo else peer_e)

        lo_pos, hi_pos = pos(lo, True), pos(hi, False)

    return (jnp.clip(lo_pos, start_idx, end_idx + 1),
            jnp.clip(hi_pos, start_idx - 1, end_idx))


def _span_sum(x, lo_pos, hi_pos, seg_start, plen):
    """Sum of x over each row's [lo_pos, hi_pos] via prefix differences."""
    idx, start_idx, _ = _seg_bounds(seg_start, plen)
    ps = jit_ascan("seg_add", _segmented_combine(jnp.add), (x, seg_start))[0]
    seg_base, _ = _propagate_from_start(ps - x, seg_start)
    pref = ps - seg_base  # prefix within segment, inclusive
    hi_v = jnp.where(hi_pos >= start_idx, pref[jnp.clip(hi_pos, 0, plen - 1)], 0)
    lo_v = jnp.where(lo_pos > start_idx, pref[jnp.clip(lo_pos - 1, 0, plen - 1)], 0)
    return hi_v - lo_v


def _span_minmax(x, lo_pos, hi_pos, op, ident, plen):
    """min/max of x over [lo_pos, hi_pos] via a sparse table: log2(n) build
    levels, then two gathers per row (no segment tree needed — spans are
    already clamped to their partition)."""
    levels = [x]
    h = 1
    while h < plen:
        prev = levels[-1]
        shifted = jnp.concatenate(
            [prev[h:], jnp.full((h,), ident, prev.dtype)])
        levels.append(op(prev, shifted))
        h *= 2
    tbl = jnp.stack(levels)  # (K, plen)
    ln = (hi_pos - lo_pos + 1).astype(jnp.float64)
    kk = jnp.where(ln >= 1,
                   jnp.floor(jnp.log2(jnp.maximum(ln, 1.0))), 0.0
                   ).astype(jnp.int64)
    kk = jnp.clip(kk, 0, len(levels) - 1)
    a = tbl[kk, jnp.clip(lo_pos, 0, plen - 1)]
    b2 = hi_pos - (jnp.int64(1) << kk) + 1
    b_ = tbl[kk, jnp.clip(b2, 0, plen - 1)]
    return jnp.where(hi_pos >= lo_pos, op(a, b_), ident)


def _bound_frame_expr(e):
    from duckdb_tpu.planner.binder import ExprBinder, Scope

    if hasattr(e, "ltype") and hasattr(e, "const_value"):
        return e
    return ExprBinder(Scope()).bind(e)


def _const_frame(e):
    return _bound_frame_expr(e).const_value()
