"""ORDER BY kernel: multi-key sort via normalized keys + lax.sort.

duckdb's 2024 sort rewrite encodes all keys into binary-comparable
normalized keys then merges runs (/root/reference/src/common/sort/sort.cpp:19-60,
src/function/scalar/create_sort_key.cpp). The same normalization idea maps
directly to TPU: each key becomes an int64 whose ascending order equals the
requested SQL order (DESC = bitwise complement; floats via sign-flip bit
trick; NULLS FIRST/LAST as a -inf/+inf fold), then one multi-operand
`lax.sort` (bitonic network — data-parallel, no host merging) orders rows.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_I64_MIN = jnp.iinfo(jnp.int64).min
_I64_MAX = jnp.iinfo(jnp.int64).max


def orderable_int64(
    data: jnp.ndarray,
    validity: Optional[jnp.ndarray],
    descending: bool,
    nulls_first: bool,
) -> jnp.ndarray:
    """Normalize one key column into an int64 whose ascending order is the SQL order."""
    if jnp.issubdtype(data.dtype, jnp.floating):
        f = data.astype(jnp.float64)
        bits = jax.lax.bitcast_convert_type(f, jnp.int64)
        # signed-orderable encoding: positives keep their bits (already
        # ascending); negatives flip magnitude bits and keep the sign bit set
        k = jnp.where(bits < 0, ~bits ^ _I64_MIN, bits)
    elif data.dtype == jnp.bool_:
        k = data.astype(jnp.int64)
    else:
        k = data.astype(jnp.int64)
    if descending:
        k = ~k
    if validity is not None:
        null_key = _I64_MIN if nulls_first else _I64_MAX
        k = jnp.where(validity, k, null_key)
    return k


def sort_permutation(
    norm_keys: Sequence[jnp.ndarray], live: jnp.ndarray
) -> jnp.ndarray:
    """Stable sort: dead rows last, then by normalized keys. Returns row perm."""
    n = live.shape[0]
    if n <= SMALL_SORT_LIMIT:
        return small_sort_permutation(norm_keys, live)
    iota = jnp.arange(n, dtype=jnp.int32)
    operands = [jnp.logical_not(live)] + list(norm_keys) + [iota]
    out = jax.lax.sort(operands, num_keys=len(operands) - 1, is_stable=True)
    return out[-1]


# Below this row count a pairwise-rank O(n²) permutation beats lax.sort on
# TPU: the stable multi-operand sort HLO lowers poorly (~30 ms floor even
# for a dozen rows), while an n×n comparison matrix is a couple of fused
# VPU passes.
SMALL_SORT_LIMIT = 2048


def small_sort_permutation(
    norm_keys: Sequence[jnp.ndarray], live: jnp.ndarray
) -> jnp.ndarray:
    """Sort-free stable permutation via pairwise lexicographic ranks."""
    n = live.shape[0]
    lt = jnp.zeros((n, n), jnp.bool_)
    eq = jnp.ones((n, n), jnp.bool_)
    keys = [jnp.logical_not(live).astype(jnp.int32)] + [
        k for k in norm_keys
    ]
    for k in keys:
        a = k[:, None]
        b = k[None, :]
        lt = jnp.logical_or(lt, jnp.logical_and(eq, a < b))
        eq = jnp.logical_and(eq, a == b)
    iota = jnp.arange(n, dtype=jnp.int32)
    lt = jnp.logical_or(lt, jnp.logical_and(eq, iota[:, None] < iota[None, :]))
    rank = jnp.sum(lt.astype(jnp.int32), axis=0)  # rows sorting before each row
    perm = jnp.sum(iota[:, None] * (rank[:, None] == iota[None, :]), axis=0)
    return perm.astype(jnp.int32)
