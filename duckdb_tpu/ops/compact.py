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

    out_size: static output capacity (>= true count, host-synced/bucketed).
    Returns (indices int32 (out_size,), out_live bool (out_size,)).
    Slots past the true count point at row 0 with out_live False.
    """
    (idx,) = jnp.nonzero(mask, size=out_size, fill_value=0)
    count = jnp.sum(mask)
    out_live = jnp.arange(out_size) < count
    return idx.astype(jnp.int32), out_live
