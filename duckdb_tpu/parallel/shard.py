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
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
        lo = jnp.searchsorted(sorted_build_keys, k, side="left")
        hi = jnp.searchsorted(sorted_build_keys, k, side="right")
        counts = jnp.where(probe_live, hi - lo, 0).astype(jnp.int32)
        return counts, lo.astype(jnp.int32)

    return jax.jit(probe)


def make_radix_exchange(mesh: Mesh, axis: str = "dp"):
    """all_to_all radix exchange: route each row to the chip owning its
    hash partition (the distributed analog of PartitionedTupleData
    repartitioning, /root/reference/src/common/radix_partitioning.cpp).

    Each chip buckets its local rows by destination chip into fixed-size
    per-destination buffers, then one all_to_all swaps the buffers.
    Returns (exchanged values, exchanged live mask).
    """
    n = mesh.shape[axis]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    def exchange(vals, live):
        # vals: (rows_per_chip,) int64; destination = hash % n
        r = vals.shape[0]
        cap = r  # per-destination buffer capacity (worst case all → one)
        h = vals.astype(jnp.uint64)
        h = (h ^ (h >> 30)) * jnp.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> 27)) * jnp.uint64(0x94D049BB133111EB)
        dest = (h ^ (h >> 31)) % jnp.uint64(n)
        dest = jnp.where(live, dest.astype(jnp.int32), n)  # dead → no bucket
        # slot within destination bucket: running count per destination
        onehot = (dest[:, None] == jnp.arange(n)[None, :])
        slot = jnp.cumsum(onehot, axis=0) - onehot
        slot = jnp.sum(slot * onehot, axis=1)
        # scatter rows into (n, cap) send buffers
        send = jnp.zeros((n, cap), vals.dtype)
        send_live = jnp.zeros((n, cap), jnp.bool_)
        ok = jnp.logical_and(live, slot < cap)
        d_idx = jnp.where(ok, dest, 0)
        s_idx = jnp.where(ok, slot, 0)
        send = send.at[d_idx, s_idx].set(jnp.where(ok, vals, send[0, 0]),
                                         mode="drop")
        send_live = send_live.at[d_idx, s_idx].set(ok, mode="drop")
        # swap: chip i's buffer j → chip j's slot i
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        recv_live = jax.lax.all_to_all(send_live, axis, split_axis=0,
                                       concat_axis=0, tiled=False)
        # per-chip output: n buckets × cap slots of rows now owned here
        return recv.reshape(-1), recv_live.reshape(-1)

    return jax.jit(exchange)
