"""Selection compaction: mask → packed row indices.

duckdb filters produce SelectionVectors
(/root/reference/src/include/duckdb/common/types/selection_vector.hpp:31).
The TPU engine keeps masks through fused pipelines and only compacts at
pipeline boundaries where downstream cost depends on live-row count (join
probes, sorts, exchanges). Compaction = cumsum + gather, one XLA program.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def compact_indices(mask: jnp.ndarray, out_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed indices of true mask positions.

    out_size: static output capacity (>= true count, host-synced/bucketed
    or speculative — truncates past capacity, caller detects via count).
    Returns (indices int32 (out_size,), out_live bool (out_size,)).
    Slots past the true count point at row 0 with out_live False.

    Hand-rolled int32 cumsum+scatter instead of jnp.nonzero(size=...):
    under x64, nonzero emits int64 index arithmetic whose emulated
    (u32,u32) scatter serializes on TPU — measured 434 ms FLAT vs ~10 ms
    for this formulation at 6.3M rows on v5e.
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, pos, out_size)  # dead rows → dropped slot
    idx = jnp.zeros((out_size,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    count = pos[-1] + 1
    out_live = jnp.arange(out_size, dtype=jnp.int32) < count
    return idx, out_live
