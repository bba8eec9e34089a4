"""Multi-chip execution: shard_map'd operator programs over a device Mesh.

The reference's parallelism is morsel-driven worker threads over a shared
hash table (/root/reference/src/parallel/, src/execution/
radix_partitioned_hashtable.cpp). The TPU equivalent: base-table blocks
are sharded across a mesh axis; each chip runs the same compiled operator
program on its shard (thread-local partial state) and partials merge with
XLA collectives (psum = the Combine phase; all_to_all = the radix exchange).

This module holds the first distributed operator programs:
- sharded grouped aggregation (TPC-H Q1 shape): local perfect-hash partial
  aggregate → psum over the data-parallel axis.
- sharded hash join probe: build side replicated (broadcast exchange
  analog), probe side sharded; plus a radix all_to_all exchange variant
  for build sides too big to replicate.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def commit_inputs(jitted, mesh, in_specs):
    """Wrap a jitted shard_map program so callers may pass arrays living
    anywhere (host, a single device after `_unshard`, another mesh): each
    input is explicitly device_put onto this mesh with its in_spec before
    the call — jit refuses committed single-device arrays otherwise."""
    shardings = [NamedSharding(mesh, s) for s in in_specs]

    def call(*args):
        placed = tuple(jax.device_put(a, s)
                       for a, s in zip(args, shardings))
        return jitted(*placed)

    return call


def shard_map_compat(f, mesh, in_specs, out_specs, check=False):
    """jax.shard_map across API generations: the stable `jax.shard_map`
    (check_vma kwarg) with fallback to the deprecated
    jax.experimental.shard_map (check_rep kwarg)."""
    try:
        from jax import shard_map as _sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=check)
    try:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=check)
    except TypeError:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def shard_map(f=None, *, mesh=None, in_specs=None, out_specs=None,
              check_rep=False, **kw):
    """Drop-in for the legacy decorator/call styles used in this module."""
    if f is None:
        return lambda fn: shard_map_compat(fn, mesh, in_specs, out_specs,
                                           check=check_rep)
    return shard_map_compat(f, mesh, in_specs, out_specs, check=check_rep)


def q1_local_partial(qty, price, disc, tax, gid, live, num_groups: int):
    """Per-shard Q1 partial aggregation: one fused segment-sum program."""
    mask = live
    g = jnp.where(mask, gid, num_groups)
    one_minus_disc = price * (100 - disc)  # scaled-int decimal arithmetic
    charge = one_minus_disc * (100 + tax)
    ns = num_groups + 1

    def seg(x):
        return jax.ops.segment_sum(x, g, num_segments=ns)[:-1]

    return (
        seg(jnp.where(mask, qty, 0)),
        seg(jnp.where(mask, price, 0)),
        seg(jnp.where(mask, one_minus_disc, 0)),
        seg(jnp.where(mask, charge, 0)),
        seg(jnp.where(mask, disc, 0)),
        seg(mask.astype(jnp.int64)),
    )


def make_sharded_q1(mesh: Mesh, num_groups: int, axis: str = "dp"):
    """Build the jitted multi-chip Q1 aggregation step.

    Inputs are row-sharded over `axis`; output partials psum to every chip
    (the Combine barrier of the reference's sink contract, physical_operator
    .hpp:199-231, becomes one collective).
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def step(qty, price, disc, tax, gid, live):
        partials = q1_local_partial(qty, price, disc, tax, gid, live, num_groups)
        return tuple(jax.lax.psum(p, axis) for p in partials)

    return jax.jit(step)


def make_sharded_join_probe(mesh: Mesh, axis: str = "dp"):
    """Replicated-build sharded-probe equi-join counts (broadcast exchange).

    Build side (sorted keys) is replicated; probe rows are sharded. Each
    chip binary-searches its probe shard — no communication on the probe
    path, one all_gather when the build is constructed.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    def probe(sorted_build_keys, probe_keys, probe_live):
        k = jnp.where(probe_live, probe_keys, jnp.iinfo(jnp.int64).max - 1)
        lo = jnp.searchsorted(sorted_build_keys, k, side="left",
                              method="sort")
        hi = jnp.searchsorted(sorted_build_keys, k, side="right",
                              method="sort")
        counts = jnp.where(probe_live, hi - lo, 0).astype(jnp.int32)
        return counts, lo.astype(jnp.int32)

    return jax.jit(probe)


_SPLITMIX_1 = 0xBF58476D1CE4E5B9
_SPLITMIX_2 = 0x94D049BB133111EB


def _hash_dest(keys: jnp.ndarray, n: int) -> jnp.ndarray:
    """splitmix64 finalizer → owning chip for a join key (both sides must
    agree, the distributed analog of radix_partitioning.cpp's hash bits)."""
    h = keys.astype(jnp.uint64)
    h = (h ^ (h >> 30)) * jnp.uint64(_SPLITMIX_1)
    h = (h ^ (h >> 27)) * jnp.uint64(_SPLITMIX_2)
    return ((h ^ (h >> 31)) % jnp.uint64(n)).astype(jnp.int32)


def _bucketize(keys, live, rows, n: int, cap: int, key_sentinel):
    """Scatter local rows into (n, cap) per-destination send buffers.

    Slot assignment is sort-based (one lax.sort + a segmented-iota scan +
    one scatter) — O(r log r) fully parallel work, replacing the round-1
    one-hot cumsum which was O(r × n) compute and memory. Rows beyond a
    destination's capacity are counted in `dropped` (the caller syncs the
    psum and falls back / retries with a bigger cap — bounded buffers
    instead of the round-1 cap=r worst-case blowup)."""
    r = keys.shape[0]
    dest = jnp.where(live, _hash_dest(keys, n), n)
    iota = jnp.arange(r, dtype=jnp.int32)
    sd, perm = jax.lax.sort([dest, iota], num_keys=1, is_stable=False)
    boundary = jnp.concatenate([jnp.ones((1,), jnp.bool_), sd[1:] != sd[:-1]])
    starts = jax.lax.cummax(jnp.where(boundary, iota, 0))
    pos = iota - starts
    ok = jnp.logical_and(sd < n, pos < cap)
    flat = jnp.where(ok, sd * cap + pos, n * cap)
    k_s, r_s = keys[perm], rows[perm]
    send_k = jnp.full((n * cap + 1,), key_sentinel, keys.dtype).at[flat].set(
        jnp.where(ok, k_s, key_sentinel), mode="drop")[:-1]
    send_r = jnp.full((n * cap + 1,), -1, jnp.int32).at[flat].set(
        jnp.where(ok, r_s, -1), mode="drop")[:-1]
    dropped = jnp.sum(jnp.logical_and(sd < n, ~ok).astype(jnp.int32))
    # true per-destination demand (counted BEFORE truncation): the max
    # bucket fill this chip wanted. pmax'd by callers, it sizes the
    # skew-growth retry capacity exactly (the MaybeRepartition analog,
    # /root/reference/src/execution/radix_partitioned_hashtable.cpp:545).
    edges = jnp.searchsorted(sd, jnp.arange(n + 1, dtype=sd.dtype),
                             side="left", method="sort").astype(jnp.int32)
    demand = jnp.max(edges[1:] - edges[:-1])
    return (send_k.reshape(n, cap), send_r.reshape(n, cap), dropped, demand)


_EXCHANGE_CACHE: dict = {}


def get_exchange_join(n: int, cap_p: int, cap_b: int):
    """Process-cached compiled exchange-join program (executors are
    per-query; caching here preserves jax.jit's in-memory compile cache
    across queries)."""
    import numpy as _np

    devs = jax.devices()[:n]
    key = (n, cap_p, cap_b, tuple(d.id for d in devs))
    if key not in _EXCHANGE_CACHE:
        mesh = Mesh(_np.array(devs), ("dp",))
        _EXCHANGE_CACHE[key] = make_exchange_join(mesh, n, cap_p, cap_b)
    return _EXCHANGE_CACHE[key]


def make_exchange_join(mesh: Mesh, n: int, cap_p: int, cap_b: int,
                       axis: str = "dp"):
    """One compiled program: hash-repartition probe AND build rows across
    the mesh, then join locally per chip (unique-build fast path).

    The distributed analog of the reference's radix-partitioned hash join
    (/root/reference/src/execution/radix_partitioned_hashtable.cpp:531-691
    repartitioning + physical_hash_join.cpp probe): rows of both sides
    route to hash-owner chips via one all_to_all each, and each chip
    resolves its partition with a local sorted-key lookup. Requires a
    row-unique build key set (each probe row has ≤1 match), which the
    planner proves from catalog stats before choosing this path.

    Inputs (sharded over `axis`): packed keys, live masks, global row ids
    for both sides. Outputs (sharded): for every routed probe row its
    global probe row id, matched build global row id (-1 = no match), and
    a replicated overflow count (>0 ⇒ a send bucket overflowed: results
    incomplete, caller must fall back).
    """
    sent_b = jnp.iinfo(jnp.int64).max  # sorts to the end
    sent_p = jnp.iinfo(jnp.int64).max - 1  # never equals a build sentinel

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=(P(axis), P(axis), P(), P(), P()),
    )
    def step(pk, p_live, p_rows, bk, b_live, b_rows):
        ps_k, ps_r, p_drop, p_dem = _bucketize(pk, p_live, p_rows, n,
                                               cap_p, sent_p)
        bs_k, bs_r, b_drop, b_dem = _bucketize(bk, b_live, b_rows, n,
                                               cap_b, sent_b)
        rp_k = jax.lax.all_to_all(ps_k, axis, 0, 0, tiled=False).reshape(-1)
        rp_r = jax.lax.all_to_all(ps_r, axis, 0, 0, tiled=False).reshape(-1)
        rb_k = jax.lax.all_to_all(bs_k, axis, 0, 0, tiled=False).reshape(-1)
        rb_r = jax.lax.all_to_all(bs_r, axis, 0, 0, tiled=False).reshape(-1)
        # local unique-build join: sort build partition, one searchsorted
        nb = rb_k.shape[0]
        iota_b = jnp.arange(nb, dtype=jnp.int32)
        sk, sperm = jax.lax.sort([rb_k, iota_b], num_keys=1, is_stable=False)
        srows = rb_r[sperm]
        lo = jnp.searchsorted(sk, rp_k, side="left", method="sort")
        loc = jnp.clip(lo, 0, nb - 1)
        hit = jnp.logical_and(sk[loc] == rp_k, rp_r >= 0)
        brow = jnp.where(hit, srows[loc], -1)
        overflow = jax.lax.psum(p_drop + b_drop, axis)
        need_p = jax.lax.pmax(p_dem, axis)
        need_b = jax.lax.pmax(b_dem, axis)
        return rp_r, brow, overflow, need_p, need_b

    return commit_inputs(jax.jit(step), mesh, (P(axis),) * 6)


def make_exchange_join_dup(mesh: Mesh, n: int, cap_p: int, cap_b: int,
                           cap_out: int, axis: str = "dp"):
    """Duplicate-key exchange join: hash-repartition both sides, then each
    chip resolves its partition with a sorted-build RANGE probe (counts +
    expansion) — arbitrary build-key duplication, unlike make_exchange_join
    which requires proven-unique builds.

    Reference analog: the radix-partitioned hash join's repartition +
    chained-bucket probe (/root/reference/src/execution/
    radix_partitioned_hashtable.cpp:531-691,
    src/execution/operator/join/physical_hash_join.cpp:345).

    Outputs per shard (flattened over the mesh):
    pr/br — matched (probe, build) global row id pairs, -1 padded, up to
    cap_out pairs per chip; pm — per routed probe row whether it matched
    at least once (for semi/anti/left, aligned with routed probe slots);
    prr — the routed probe row ids; overflow — replicated count of dropped
    rows (send buckets or pair expansion): >0 ⇒ caller falls back.
    """
    sent_b = jnp.iinfo(jnp.int64).max
    sent_p = jnp.iinfo(jnp.int64).max - 1

    def step(pk, p_live, p_rows, bk, b_live, b_rows):
        ps_k, ps_r, p_drop, p_dem = _bucketize(pk, p_live, p_rows, n,
                                               cap_p, sent_p)
        bs_k, bs_r, b_drop, b_dem = _bucketize(bk, b_live, b_rows, n,
                                               cap_b, sent_b)
        rp_k = jax.lax.all_to_all(ps_k, axis, 0, 0, tiled=False).reshape(-1)
        rp_r = jax.lax.all_to_all(ps_r, axis, 0, 0, tiled=False).reshape(-1)
        rb_k = jax.lax.all_to_all(bs_k, axis, 0, 0, tiled=False).reshape(-1)
        rb_r = jax.lax.all_to_all(bs_r, axis, 0, 0, tiled=False).reshape(-1)
        nb = rb_k.shape[0]
        npr = rp_k.shape[0]
        iota_b = jnp.arange(nb, dtype=jnp.int32)
        sk, sperm = jax.lax.sort([rb_k, iota_b], num_keys=1, is_stable=False)
        srows = rb_r[sperm]
        lo = jnp.searchsorted(sk, rp_k, side="left", method="sort")
        hi = jnp.searchsorted(sk, rp_k, side="right", method="sort")
        counts = jnp.where(rp_r >= 0, (hi - lo).astype(jnp.int32), 0)
        ends = jnp.cumsum(counts)
        total = ends[-1]
        # pair j ↦ probe slot via one searchsorted over the end offsets
        j = jnp.arange(cap_out, dtype=jnp.int32)
        slot = jnp.searchsorted(ends, j, side="right", method="sort")
        slot_c = jnp.clip(slot, 0, npr - 1)
        k = j - (ends[slot_c] - counts[slot_c])
        pair_live = j < total
        pr = jnp.where(pair_live, rp_r[slot_c], -1)
        br_idx = jnp.clip(lo[slot_c] + k, 0, nb - 1)
        br = jnp.where(pair_live, srows[br_idx], -1)
        pair_drop = jnp.maximum(total - cap_out, 0)
        overflow = jax.lax.psum(p_drop + b_drop + pair_drop, axis)
        pair_max = jax.lax.pmax(total, axis)  # true per-chip demand,
        # counted BEFORE truncation — sizes the retry capacity exactly
        need_p = jax.lax.pmax(p_dem, axis)
        need_b = jax.lax.pmax(b_dem, axis)
        return pr, br, counts > 0, rp_r, overflow, pair_max, need_p, need_b

    mapped = shard_map_compat(
        step, mesh, (P(axis),) * 6,
        (P(axis), P(axis), P(axis), P(axis), P(), P(), P(), P()))
    return commit_inputs(jax.jit(mapped), mesh, (P(axis),) * 6)


def make_sharded_sort(mesh: Mesh, n: int, cap: int, nkeys: int = 1,
                      axis: str = "dp"):
    """Distributed ORDER BY: sample-based range partitioning + local sort.

    Each chip sorts its shard, publishes quantile samples (all_gather),
    and routes rows to the owner of their splitter range via one
    all_to_all; a final local sort per chip yields a globally ordered
    shard-major concatenation. The reference's parallel sort builds
    per-thread sorted runs and k-way-merges them
    (/root/reference/src/common/sort/sorted_run_merger.cpp); range
    partitioning replaces the merge with a collective so no single chip
    touches the full row set.

    Inputs (sharded): normalized int64 sort keys, live mask, global row
    ids. Outputs: row ids in global sort order (shard-major, dead slots
    padded -1), live mask, replicated overflow count.
    """
    SENT = jnp.iinfo(jnp.int64).max
    S = 64  # samples per shard

    def step(keys, live, rows):
        # keys: (nkeys, r) normalized lexicographic sort keys. Range
        # partitioning routes by the PRIMARY key only — rows with equal
        # primary keys land on the same shard, so the local sort over the
        # full key tuple (+ global row id as final tiebreak, matching the
        # single-chip stable sort exactly) yields global order.
        r = keys.shape[1]
        k_mask = jnp.where(live, keys[0], SENT)
        iota = jnp.arange(r, dtype=jnp.int32)
        k_sorted, _ = jax.lax.sort([k_mask, iota], num_keys=1,
                                   is_stable=False)
        n_local = jnp.sum(live)
        pos = jnp.clip((jnp.arange(S) * n_local) // S, 0, r - 1)
        samples = jnp.where(n_local > 0, k_sorted[pos], SENT)
        all_samples = jax.lax.all_gather(samples, axis).reshape(-1)
        ss = jnp.sort(all_samples)
        # n-1 splitters at the global sample quantiles
        spl = ss[jnp.clip((jnp.arange(1, n) * (n * S)) // n,
                          0, n * S - 1)]
        dest = jnp.searchsorted(spl, k_mask, side="right",
                                method="sort").astype(jnp.int32)
        dest = jnp.where(live, dest, n)
        # route (keys, row) to the owner shard
        sd, perm = jax.lax.sort([dest, iota], num_keys=1, is_stable=False)
        boundary = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                    sd[1:] != sd[:-1]])
        starts = jax.lax.cummax(jnp.where(boundary, iota, 0))
        posb = iota - starts
        ok = jnp.logical_and(sd < n, posb < cap)
        flat = jnp.where(ok, sd * cap + posb, n * cap)
        send_ks = []
        for ki in range(nkeys):
            kv = jnp.where(live, keys[ki], SENT)
            send_ks.append(jnp.full((n * cap + 1,), SENT, keys.dtype)
                           .at[flat].set(jnp.where(ok, kv[perm], SENT),
                                         mode="drop")[:-1])
        send_r = jnp.full((n * cap + 1,), -1, jnp.int32).at[flat].set(
            jnp.where(ok, rows[perm], -1), mode="drop")[:-1]
        dropped = jnp.sum(jnp.logical_and(sd < n, ~ok).astype(jnp.int32))
        rks = [jax.lax.all_to_all(sk.reshape(n, cap), axis, 0, 0,
                                  tiled=False).reshape(-1)
               for sk in send_ks]
        rr = jax.lax.all_to_all(send_r.reshape(n, cap), axis, 0, 0,
                                tiled=False).reshape(-1)
        # sort received rows by the full key tuple; liveness rides the ROW
        # ID (-1 = pad slot): a real NULLS-LAST key normalizes to
        # INT64_MAX and must not be confused with the pad sentinel. The
        # row id is the FINAL sort key, so ties resolve exactly like the
        # single-chip stable sort (global row order).
        out = jax.lax.sort(rks + [rr], num_keys=nkeys + 1, is_stable=False)
        or_ = out[-1]
        out_live = or_ >= 0
        overflow = jax.lax.psum(dropped, axis)
        # true range-bucket demand (pre-truncation) → exact skew retry cap
        edges = jnp.searchsorted(sd, jnp.arange(n + 1, dtype=sd.dtype),
                                 side="left", method="sort")
        need = jax.lax.pmax(jnp.max(edges[1:] - edges[:-1]).astype(
            jnp.int32), axis)
        return jnp.where(out_live, or_, -1), out_live, overflow, need

    mapped = shard_map_compat(step, mesh, (P(None, axis), P(axis), P(axis)),
                              (P(axis), P(axis), P(), P()))
    return commit_inputs(jax.jit(mapped), mesh,
                         (P(None, axis), P(axis), P(axis)))


_DUP_CACHE: dict = {}
_SORT_CACHE: dict = {}


def get_exchange_join_dup(n: int, cap_p: int, cap_b: int, cap_out: int):
    import numpy as _np

    devs = jax.devices()[:n]
    key = (n, cap_p, cap_b, cap_out, tuple(d.id for d in devs))
    if key not in _DUP_CACHE:
        mesh = Mesh(_np.array(devs), ("dp",))
        _DUP_CACHE[key] = make_exchange_join_dup(mesh, n, cap_p, cap_b,
                                                 cap_out)
    return _DUP_CACHE[key]


def get_sharded_sort(n: int, cap: int, nkeys: int = 1):
    import numpy as _np

    devs = jax.devices()[:n]
    key = (n, cap, nkeys, tuple(d.id for d in devs))
    if key not in _SORT_CACHE:
        mesh = Mesh(_np.array(devs), ("dp",))
        _SORT_CACHE[key] = make_sharded_sort(mesh, n, cap, nkeys)
    return _SORT_CACHE[key]


# -- distributed window functions --------------------------------------------
# The reference parallelizes window computation by hashing partitions onto
# threads and sorting locally (src/common/sort/hashed_sort.cpp). Here the
# same strategy maps onto the mesh: rows hash-route to their partition's
# owner chip via one all_to_all, each chip sorts ITS partitions and runs
# the segmented window kernel, and results ride back keyed by global row
# id. Order keys and the argument plane are passed replicated and gathered
# by row id after the exchange (on real multi-chip HW that replication is
# one all_gather; the reference likewise materializes payload per thread).

def make_sharded_window(mesh: Mesh, n: int, cap: int, n_pkeys: int,
                        n_okeys: int, kind: str, running: bool,
                        axis: str = "dp"):
    """kind: row_number | rank | dense_rank | count | sum | avg | min | max.
    `running` = default frame with ORDER BY (range unbounded→current row,
    peer-extended); False = whole-partition frame. Routing hashes the
    FIRST partition key (rows sharing it co-locate, a superset of each
    partition); exact segment boundaries come from the full gathered
    partition-key tuple."""
    sent = jnp.iinfo(jnp.int64).max

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis))
        + (P(),) * (n_pkeys + n_okeys + 2),
        out_specs=(P(axis), P(axis), P(axis), P(), P()),
    )
    def step(pk, live, rows, *payload):
        pkeys_full = payload[:n_pkeys]
        okeys_full = payload[n_pkeys:n_pkeys + n_okeys]
        arg_full = payload[n_pkeys + n_okeys]
        argv_full = payload[n_pkeys + n_okeys + 1]
        sk, sr, drop, dem = _bucketize(pk, live, rows, n, cap, sent)
        rr = jax.lax.all_to_all(sr, axis, 0, 0, tiled=False).reshape(-1)
        m = rr.shape[0]
        dead = rr < 0
        rc = jnp.clip(rr, 0, None)
        pks = [k[rc] for k in pkeys_full]
        oks = [ok[rc] for ok in okeys_full]
        x = arg_full[rc]
        xv = jnp.logical_and(argv_full[rc], jnp.logical_not(dead))
        iota = jnp.arange(m, dtype=jnp.int32)
        ops = [dead] + pks + list(oks) + [iota]
        out = jax.lax.sort(ops, num_keys=len(ops) - 1, is_stable=True)
        dead_s, perm = out[0], out[-1]
        pk_s = out[1:1 + n_pkeys]
        ok_s = out[1 + n_pkeys:-1]
        seg_start = jnp.zeros((m,), jnp.bool_).at[0].set(True)
        seg_start = jnp.logical_or(seg_start, dead_s != jnp.roll(dead_s, 1))
        for k in pk_s:
            seg_start = jnp.logical_or(seg_start, k != jnp.roll(k, 1))
        seg_start = seg_start.at[0].set(True)
        peer_start = seg_start
        for k in ok_s:
            peer_start = jnp.logical_or(peer_start, k != jnp.roll(k, 1))
        peer_start = peer_start.at[0].set(True)
        seg_idx = jax.lax.cummax(jnp.where(seg_start, iota, 0))
        x_s = jnp.where(xv[perm], x[perm], 0)
        xv_s = xv[perm]
        valid = jnp.ones((m,), jnp.bool_)
        if kind == "row_number":
            val = (iota - seg_idx + 1).astype(jnp.int64)
        elif kind == "rank":
            peer_idx = jax.lax.cummax(jnp.where(peer_start, iota, 0))
            val = (peer_idx - seg_idx + 1).astype(jnp.int64)
        elif kind == "dense_rank":
            ds = jnp.cumsum(peer_start.astype(jnp.int64))
            val = ds - ds[seg_idx] + 1
        else:
            xs = x_s.astype(jnp.float64) if kind == "avg" \
                else x_s.astype(jnp.int64) if x_s.dtype != jnp.float64 \
                else x_s
            cs = jnp.cumsum(jnp.where(xv_s, xs, 0))
            cnt = jnp.cumsum(xv_s.astype(jnp.int64))
            base = jnp.where(seg_idx > 0, cs[jnp.clip(seg_idx - 1, 0, None)],
                             0)
            cbase = jnp.where(seg_idx > 0,
                              cnt[jnp.clip(seg_idx - 1, 0, None)], 0)
            if running:
                is_last = jnp.roll(peer_start, -1).at[-1].set(True)
                end = jnp.flip(jax.lax.cummax(
                    jnp.flip(jnp.where(is_last, iota, -1))))
            else:
                is_seg_last = jnp.roll(seg_start, -1).at[-1].set(True)
                end = jnp.flip(jax.lax.cummax(
                    jnp.flip(jnp.where(is_seg_last, iota, -1))))
            ec = jnp.clip(end, 0, m - 1)
            tot = cs[ec] - base
            nc = cnt[ec] - cbase
            if kind == "count":
                val = nc
            elif kind == "avg":
                val = tot.astype(jnp.float64) / jnp.maximum(nc, 1)
                valid = nc > 0
            elif kind in ("min", "max"):
                seg_id = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
                sentv = jnp.iinfo(jnp.int64).max if kind == "min" \
                    else jnp.iinfo(jnp.int64).min
                xm = jnp.where(xv_s, x_s.astype(jnp.int64), sentv)
                op = jax.ops.segment_min if kind == "min" \
                    else jax.ops.segment_max
                val = op(xm, seg_id, num_segments=m)[seg_id]
                valid = nc > 0
            else:  # sum
                val = tot
                valid = nc > 0
        rows_out = rr[perm]
        overflow = jax.lax.psum(drop, axis)
        need = jax.lax.pmax(dem, axis)
        return rows_out, val, jnp.logical_and(valid,
                                              jnp.logical_not(dead_s)), \
            overflow, need

    return commit_inputs(
        jax.jit(step), mesh, (P(axis), P(axis), P(axis))
        + (P(),) * (n_pkeys + n_okeys + 2))


_WINDOW_CACHE: dict = {}


def get_sharded_window(n: int, cap: int, n_pkeys: int, n_okeys: int,
                       kind: str, running: bool):
    import numpy as _np

    devs = jax.devices()[:n]
    key = (n, cap, n_pkeys, n_okeys, kind, running,
           tuple(d.id for d in devs))
    if key not in _WINDOW_CACHE:
        mesh = Mesh(_np.array(devs), ("dp",))
        _WINDOW_CACHE[key] = make_sharded_window(mesh, n, cap, n_pkeys,
                                                 n_okeys, kind, running)
    return _WINDOW_CACHE[key]


def make_sharded_topn(mesh: Mesh, n: int, k: int, nkeys: int,
                      axis: str = "dp"):
    """Per-shard top-k + all_gather of the n·k candidates (the final
    k-way merge runs on the caller's single device — the candidate set is
    tiny). Dead rows sort last and surface as row id -1."""
    sent = jnp.iinfo(jnp.int64).max

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    def step(keys, live, rows):
        ks = [jnp.where(live, keys[i], sent) for i in range(nkeys)]
        ops = ks + [jnp.where(live, rows, -1)]
        out = jax.lax.sort(ops, num_keys=nkeys, is_stable=True)
        topk_keys = jnp.stack([o[:k] for o in out[:nkeys]])
        topk_rows = out[-1][:k]
        gk = jax.lax.all_gather(topk_keys, axis, axis=1, tiled=True)
        gr = jax.lax.all_gather(topk_rows, axis, axis=0, tiled=True)
        return gk, gr

    return commit_inputs(jax.jit(step), mesh,
                         (P(None, axis), P(axis), P(axis)))


_TOPN_CACHE: dict = {}


def get_sharded_topn(n: int, k: int, nkeys: int):
    import numpy as _np

    devs = jax.devices()[:n]
    key = (n, k, nkeys, tuple(d.id for d in devs))
    if key not in _TOPN_CACHE:
        mesh = Mesh(_np.array(devs), ("dp",))
        _TOPN_CACHE[key] = make_sharded_topn(mesh, n, k, nkeys)
    return _TOPN_CACHE[key]
