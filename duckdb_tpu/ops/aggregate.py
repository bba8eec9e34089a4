"""Grouped aggregation kernels.

Two TPU-native strategies replace duckdb's linear-probing
GroupedAggregateHashTable (/root/reference/src/execution/aggregate_hashtable.cpp):

1. **Perfect-hash grouping** (duckdb's PerfectAggregateHashTable analog,
   /root/reference/src/execution/perfect_aggregate_hashtable.cpp): when the
   product of key domains is small (dictionary codes, small int ranges),
   group id = mixed-radix combination of keys and aggregation is one
   `segment_sum` — a single fused scatter-reduce, no sort, no probe.

2. **Sort-based grouping**: multi-operand `lax.sort` (bitonic on TPU, fully
   vectorized) groups arbitrary keys; run boundaries become dense group ids
   and aggregates are segment reductions with `indices_are_sorted=True`.

Both express the whole groupby as one XLA program over the block — the
morsel/partition/repartition machinery is replaced by the compiler's tiling
plus (later) shard_map partials + collective combines.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def perfect_group_ids(
    keys: Sequence[jnp.ndarray],
    domains: Sequence[int],
    live: jnp.ndarray,
) -> Tuple[jnp.ndarray, int]:
    """Mixed-radix group id from small-domain integer keys.

    Dead rows (padding / filtered) get the trash group `num_groups`.
    Returns (gid array, num_groups) where outputs index [0, num_groups).
    """
    assert len(keys) == len(domains) and keys
    gid = jnp.zeros(keys[0].shape, dtype=jnp.int32)
    num_groups = 1
    for k, d in zip(keys, domains):
        gid = gid * jnp.int32(d) + jnp.clip(k.astype(jnp.int32), 0, d - 1)
        num_groups *= int(d)
    gid = jnp.where(live, gid, jnp.int32(num_groups))
    return gid, num_groups


def sort_group_ids(
    keys: Sequence[jnp.ndarray],
    live: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort-based grouping over arbitrary integer-comparable keys.

    Returns (perm, gid_sorted, num_groups_arr):
      perm: row permutation sorting dead rows last, then by keys
      gid_sorted: dense group id per *sorted* position; dead rows get the id
        after the last real group
      num_groups_arr: scalar int32 array = number of live groups
    """
    n = keys[0].shape[0]
    dead = jnp.logical_not(live)
    iota = jnp.arange(n, dtype=jnp.int32)
    operands = [dead] + [k for k in keys] + [iota]
    sorted_ops = jax.lax.sort(operands, num_keys=len(operands) - 1, is_stable=False)
    dead_s = sorted_ops[0]
    keys_s = sorted_ops[1:-1]
    perm = sorted_ops[-1]
    # run boundary where any key changes (first live row is a boundary)
    change = jnp.zeros(n, dtype=bool).at[0].set(True)
    for k in keys_s:
        change = jnp.logical_or(change, k != jnp.roll(k, 1))
    change = jnp.logical_and(change, jnp.logical_not(dead_s))
    change = change.at[0].set(jnp.logical_not(dead_s[0]))
    gid_sorted = jnp.cumsum(change.astype(jnp.int32)) - 1
    num_groups = gid_sorted[-1] + 1  # dead rows sorted last; if none live → 0
    num_groups = jnp.where(dead_s[0], jnp.int32(0), num_groups)
    # dead rows → trash slot num_groups
    gid_sorted = jnp.where(dead_s, num_groups, gid_sorted)
    return perm, gid_sorted, num_groups


def segment_sum(
    data: jnp.ndarray, gids: jnp.ndarray, num_segments: int, sorted_ids: bool = False
) -> jnp.ndarray:
    return jax.ops.segment_sum(
        data, gids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def segment_min(data, gids, num_segments, sorted_ids=False):
    return jax.ops.segment_min(
        data, gids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def segment_max(data, gids, num_segments, sorted_ids=False):
    return jax.ops.segment_max(
        data, gids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def segment_count(live: jnp.ndarray, gids: jnp.ndarray, num_segments: int, sorted_ids=False):
    return jax.ops.segment_sum(
        live.astype(jnp.int64), gids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )
