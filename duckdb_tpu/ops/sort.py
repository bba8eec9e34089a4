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
    iota = jnp.arange(n, dtype=jnp.int32)
    operands = [jnp.logical_not(live)] + list(norm_keys) + [iota]
    out = jax.lax.sort(operands, num_keys=len(operands) - 1, is_stable=True)
    return out[-1]
