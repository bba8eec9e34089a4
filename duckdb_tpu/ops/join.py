"""Hash-join kernels, TPU-native.

duckdb probes a linear-probing pointer table with salted entries and chases
row chains (/root/reference/src/execution/join_hashtable.cpp:1178). That
shape is pointer-chasing and CAS-heavy — wrong for a TPU. Here the build
side is *sorted by key* once (bitonic `lax.sort`, MXU/VPU friendly) and the
probe is a batched binary search (`searchsorted`: log2(N) coalesced
gathers), with duplicate runs handled by [lo, hi) ranges:

  build:  sort(keys) → (sorted_keys, row_perm)
  probe:  lo = searchsorted(keys, probe, 'left'); hi = ... 'right'
          count = hi - lo        (0 ⇒ no match)

Inner/left expansion uses `repeat(total_repeat_length=T)` with T synced to
host once per probe (the pipeline-boundary equivalent of duckdb's
HAVE_MORE_OUTPUT loop). Semi/anti/mark never expand — they are pure masks.

A perfect-hash fast path (duckdb PerfectHashJoinExecutor analog,
/root/reference/src/include/duckdb/execution/operator/join/perfect_hash_join_executor.hpp)
indexes a dense array directly when build keys are unique dense ints.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclass
class SortedBuildTable:
    """Build-side state: keys sorted ascending + permutation to original rows."""

    sorted_keys: jnp.ndarray  # (B,) int64, dead rows pushed to +INF end
    perm: jnp.ndarray  # (B,) int32 original row index per sorted slot
    num_rows: jnp.ndarray  # scalar: live build rows

    def probe_ranges(self, probe_keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # method='sort' lowers to sort+scatter (a couple of parallel stages)
        # instead of the default binary-search while-loop, whose log2(B)
        # dependent iterations each pay the runtime's serialized-stage
        # latency (measured 14s on a 6M-row probe vs <1s for the sorts)
        lo = jnp.searchsorted(self.sorted_keys, probe_keys, side="left",
                              method="sort")
        hi = jnp.searchsorted(self.sorted_keys, probe_keys, side="right",
                              method="sort")
        return lo.astype(jnp.int32), hi.astype(jnp.int32)


_KEY_SENTINEL = jnp.iinfo(jnp.int64).max


def build_sorted(keys: jnp.ndarray, live: jnp.ndarray) -> SortedBuildTable:
    """Sort build keys; dead rows (padding/filtered/NULL key) go to the end.

    NULL join keys never match (SQL equi-join semantics), so callers must
    fold key-validity into `live`.
    """
    k = jnp.where(live, keys.astype(jnp.int64), _KEY_SENTINEL)
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    sorted_keys, perm = jax.lax.sort([k, iota], num_keys=1, is_stable=False)
    return SortedBuildTable(sorted_keys=sorted_keys, perm=perm, num_rows=jnp.sum(live))


def probe_counts(
    table: SortedBuildTable, probe_keys: jnp.ndarray, probe_live: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-probe-row match count and [lo, hi) range. Dead probe rows count 0.

    Probe keys equal to the sentinel cannot exist for in-range key domains;
    the engine packs keys so INT64_MAX is never a live key.
    """
    k = jnp.where(probe_live, probe_keys.astype(jnp.int64), _KEY_SENTINEL - 1)
    lo, hi = table.probe_ranges(k)
    counts = jnp.where(probe_live, hi - lo, 0).astype(jnp.int32)
    return counts, lo, hi


def expand_matches(
    counts: jnp.ndarray,
    lo: jnp.ndarray,
    perm: jnp.ndarray,
    total: int,
    left_outer: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expand probe×build match pairs to flat row indices.

    total: static padded output size (>= true match count, host-synced).
    Returns (probe_rows, build_rows, out_live). For left_outer, probe rows
    with zero matches emit one row with build_rows == -1 (NULL build side).
    """
    n = counts.shape[0]
    eff_counts = jnp.maximum(counts, 1) if left_outer else counts
    starts = jnp.cumsum(eff_counts) - eff_counts
    true_total = starts[-1] + eff_counts[-1]
    probe_rows = jnp.repeat(
        jnp.arange(n, dtype=jnp.int32), eff_counts, total_repeat_length=total
    )
    offs = jnp.arange(total, dtype=jnp.int32) - starts[probe_rows].astype(jnp.int32)
    build_pos = lo[probe_rows].astype(jnp.int32) + offs
    build_rows = perm[jnp.clip(build_pos, 0, perm.shape[0] - 1)]
    out_live = jnp.arange(total) < true_total
    if left_outer:
        unmatched = counts[probe_rows] == 0
        build_rows = jnp.where(unmatched, -1, build_rows)
    return probe_rows, build_rows, out_live


def perfect_build(
    keys: jnp.ndarray, live: jnp.ndarray, min_key: int, max_key: int
) -> jnp.ndarray:
    """Dense direct-address table: slot k-min_key → build row index (or -1).

    Valid when build keys are unique within [min_key, max_key] (e.g. primary
    keys). This is the duckdb perfect-hash join analog: probe is ONE gather.
    """
    size = max_key - min_key + 1
    slots = jnp.full((size,), -1, dtype=jnp.int32)
    idx = jnp.clip(keys.astype(jnp.int64) - min_key, 0, size - 1).astype(jnp.int32)
    rows = jnp.arange(keys.shape[0], dtype=jnp.int32)
    return slots.at[idx].set(jnp.where(live, rows, -1), mode="drop")


def perfect_probe(
    slots: jnp.ndarray, probe_keys: jnp.ndarray, probe_live: jnp.ndarray, min_key: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (build_rows, matched) — one gather per probe row."""
    size = slots.shape[0]
    idx = probe_keys.astype(jnp.int64) - min_key
    in_range = jnp.logical_and(idx >= 0, idx < size)
    idx = jnp.clip(idx, 0, size - 1).astype(jnp.int32)
    rows = slots[idx]
    matched = jnp.logical_and(jnp.logical_and(in_range, rows >= 0), probe_live)
    return rows, matched
