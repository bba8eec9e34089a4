"""Grouped reduction kernels: the TPU replacement for hash-table aggregation.

The reference aggregates through GroupedAggregateHashTable (a linear-probing
hash table touched row-at-a-time, /root/reference/src/execution/
aggregate_hashtable.cpp:399). The literal XLA translation — segment_sum, a
scatter-add — lowers catastrophically on TPU: scatter serializes into a
row-loop fusion (measured 514 ms for 6.3M×13 int64 on v5e; the entire Q1
budget). TPUs want reductions and matmuls, not scatters.

Strategy by group-domain size G (measured on v5e, 6.3M rows × 13 int64):

- G ≤ MASKED_REDUCE_LIMIT: *masked broadcast reduce* — compare group ids
  against iota(G) and reduce each slot's rows with one fused
  where+sum/min/max pass: out[g,k] = Σ_n (dense[n]==g)·mat[n,k].
  XLA fuses the (N,G,K) broadcast into VPU passes without materializing it.
  43.8 ms at G=12 (11.7× over scatter), 52 ms at G=64.

- larger G: segment_sum scatter (slow but general). The sorted-runs
  pallas kernel is the planned replacement (see ops/pallas_agg.py).

All sums are exact: int64 sums stay in (emulated) int64; float sums in f64.
int64 einsum/dot is NOT usable — the x64 emulation pass cannot rewrite
s64 dot_general (measured: compile error).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Crossover measured on v5e (see PERF.md round 2): the bcast reduce
# materializes an (N, G) pred plane, so it scales ~linearly with G
# (G=64: 52 ms, G=256: 256 ms, G=1024: 927 ms) while the scatter lowering
# costs ~514 ms flat — crossover is near G=512; 256 keeps headroom.
MASKED_REDUCE_LIMIT = 256

_I64_MAX = np.iinfo(np.int64).max
_I64_MIN = np.iinfo(np.int64).min


def _sentinel(kind: str, dtype):
    if kind == "min":
        return (jnp.inf if jnp.issubdtype(dtype, jnp.floating)
                else jnp.iinfo(dtype).max)
    return (-jnp.inf if jnp.issubdtype(dtype, jnp.floating)
            else jnp.iinfo(dtype).min)


def grouped_reduce(dense: jnp.ndarray, vectors: Sequence[jnp.ndarray],
                   kinds: Sequence[str], nseg: int) -> List[jnp.ndarray]:
    """Per-slot reductions of per-row vectors.

    dense: (N,) int slot ids in [0, nseg); rows with id >= nseg (or < 0)
    are dead and contribute to no slot.
    vectors[i]: (N,) values already masked (dead rows hold the identity:
    0 for sum, ±sentinel for min/max).
    kinds[i] ∈ {"sum", "min", "max"}.
    Returns per-slot arrays of shape (nseg,), same dtype as each vector.
    """
    n = int(dense.shape[0]) if dense.shape else 0
    # the bcast reduce materializes an (N, nseg) pred plane: cap the PLANE
    # bytes too, not just nseg — 60M rows × 216 slots was a 14 GB
    # allocation (HBM OOM at SF10); the scatter path is O(N)
    if nseg <= MASKED_REDUCE_LIMIT and n * max(nseg, 1) <= (1 << 31):
        return _masked_bcast(dense, vectors, kinds, nseg)
    return _scatter(dense, vectors, kinds, nseg)


def grouped_sum_single(dense: jnp.ndarray, vec: jnp.ndarray,
                       nseg: int) -> jnp.ndarray:
    """Convenience: one summed vector (occupancy counts etc.)."""
    return grouped_reduce(dense, [vec], ["sum"], nseg)[0]


def _masked_bcast(dense, vectors, kinds, nseg):
    # int64 sums: on TPU the masked reduce is x64-EMULATED per row × slot;
    # the Pallas limb-matmul kernel does the same sums exactly on the MXU
    # in int32/bf16 (ops/pallas_agg.py). Other kinds/dtypes stay here.
    from duckdb_tpu.ops import pallas_agg

    if pallas_agg.enabled() and pallas_agg.fits_vmem(
            nseg, sum(1 for v, k in zip(vectors, kinds)
                      if k == "sum" and v.dtype in (jnp.int64, jnp.uint64))):
        i64_sum = [i for i, (v, k) in enumerate(zip(vectors, kinds))
                   if k == "sum" and v.dtype in (jnp.int64, jnp.uint64)]
        if i64_sum:
            sums = pallas_agg.grouped_sum_i64(
                dense, [vectors[i] for i in i64_sum], nseg)
            rest_idx = [i for i in range(len(vectors)) if i not in i64_sum]
            results = [None] * len(vectors)
            for i, s in zip(i64_sum, sums):
                results[i] = s.astype(vectors[i].dtype)
            if rest_idx:
                rest = _masked_bcast(dense, [vectors[i] for i in rest_idx],
                                     [kinds[i] for i in rest_idx], nseg)
                for i, r in zip(rest_idx, rest):
                    results[i] = r
            return results
    oh = dense[:, None] == jnp.arange(nseg, dtype=dense.dtype)[None, :]
    out = []
    # group same-kind same-dtype vectors into one (N, nseg, K) fused reduce
    # so XLA emits one pass per (kind, dtype) class
    order: List[Tuple[str, object]] = []
    buckets = {}
    for i, (v, k) in enumerate(zip(vectors, kinds)):
        key = (k, v.dtype)
        if key not in buckets:
            buckets[key] = []
            order.append(key)
        buckets[key].append(i)
    results = [None] * len(vectors)
    for key in order:
        k, dt = key
        idxs = buckets[key]
        mat = jnp.stack([vectors[i] for i in idxs], axis=1)  # (N, K)
        if k == "sum":
            r = jnp.sum(jnp.where(oh[:, :, None], mat[:, None, :],
                                  jnp.zeros((), dt)), axis=0)
        elif k == "min":
            r = jnp.min(jnp.where(oh[:, :, None], mat[:, None, :],
                                  _sentinel("min", dt)), axis=0)
        else:
            r = jnp.max(jnp.where(oh[:, :, None], mat[:, None, :],
                                  _sentinel("max", dt)), axis=0)
        for j, i in enumerate(idxs):
            results[i] = r[:, j]
    return results


def _scatter(dense, vectors, kinds, nseg):
    # batch sum-kind vectors per dtype into one 2D segment_sum (each scatter
    # op is a serialized stage on high-latency runtimes); one overflow slot
    # absorbs dead rows (ids outside [0, nseg) clip there)
    d = jnp.clip(dense.astype(jnp.int32), -1, nseg) % jnp.int32(nseg + 1)
    results = [None] * len(vectors)
    sum_groups = {}
    for i, (v, k) in enumerate(zip(vectors, kinds)):
        if k == "sum":
            key = ("i64" if v.dtype in (jnp.int64, jnp.uint64) else v.dtype)
            sum_groups.setdefault(key, []).append(i)
        elif k == "min":
            results[i] = jax.ops.segment_min(v, d, num_segments=nseg + 1)[:-1]
        else:
            results[i] = jax.ops.segment_max(v, d, num_segments=nseg + 1)[:-1]
    for dt, idxs in sum_groups.items():
        if dt == "i64":
            # int64 scatter-add is x64-EMULATED on TPU and lowers to a
            # serialized (u32,u32)-pair loop (measured 427 ms for one
            # 32k-slot scatter on v5e). Decompose into 3×22-bit limbs and
            # scatter-add in NATIVE f64: limb sums stay < 2^53 for any
            # segment up to 2^31 rows, so recombination in int64 is exact,
            # and wrap-around matches int64 adds (sums are congruent
            # mod 2^64). ~100× faster than the emulated path.
            mat = jnp.stack([vectors[i] for i in idxs], axis=1)
            l0 = (mat & 0x3FFFFF).astype(jnp.float64)
            l1 = ((mat >> 22) & 0x3FFFFF).astype(jnp.float64)
            l2 = (mat >> 44).astype(jnp.float64)  # arithmetic: signed top
            limbs = jnp.concatenate([l0, l1, l2], axis=1)
            s = jax.ops.segment_sum(limbs, d, num_segments=nseg + 1)[:-1]
            k = len(idxs)
            s64 = (s[:, :k].astype(jnp.int64)
                   + (s[:, k:2 * k].astype(jnp.int64) << 22)
                   + (s[:, 2 * k:].astype(jnp.int64) << 44))
            for j, i in enumerate(idxs):
                results[i] = s64[:, j].astype(vectors[i].dtype)
        else:
            mat = jnp.stack([vectors[i] for i in idxs], axis=1)
            s = jax.ops.segment_sum(mat, d, num_segments=nseg + 1)[:-1]
            for j, i in enumerate(idxs):
                results[i] = s[:, j]
    return results
