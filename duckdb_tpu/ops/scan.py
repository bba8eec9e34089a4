"""Cumulative/segmented scan primitives tuned for EAGER dispatch.

`jax.lax.associative_scan` is a JAX-level combinator that unrolls into
O(log n) slice/concat/pad primitives with a UNIQUE shape at every level:
dispatched eagerly (outside jit) each of those is a separate tiny XLA
compilation — a single 3M-row scan costs ~90 compiles, and a cold
join-heavy query (TPC-H Q9 build prep) was measured paying >1,000
compilations (~500 s) before its first row. The engine's operator
pipelines that run eagerly (join build prep, window frames, exchange
routing) therefore must never call `associative_scan` directly.

Two replacements:

- `cummax` / `cummin` / `cumsum`: true XLA primitives (one dispatch, one
  cacheable compile). All plain single-array scans use these.
- `jit_ascan`: for combinators with tuple carries (segmented scans),
  wraps the associative_scan in a shape-keyed cached `jax.jit`, so each
  distinct (combinator, shapes) pair compiles exactly ONE program which
  the persistent compilation cache reuses across processes.

Reference analog: duckdb's windowed segment tree
(src/execution/window_segment_tree.cpp) builds level arrays iteratively;
the log-depth scan here is the same computation as one XLA program.
"""

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

cummax = jax.lax.cummax
cummin = jax.lax.cummin


def segment_starts(seg_start, n: int, dtype=jnp.int32):
    """Index of each row's segment start: cummax over start positions.

    seg_start: bool (n,), True at the first row of every segment (row 0
    must be True). Returns int (n,): start_idx[i] = index of the start
    of i's segment.
    """
    idx = jnp.arange(n, dtype=dtype)
    return jax.lax.cummax(jnp.where(seg_start, idx, dtype(0)))


_JIT_ASCAN_CACHE: Dict[Tuple, Any] = {}


def jit_ascan(name: str, comb: Callable, xs, reverse: bool = False):
    """associative_scan with a tuple carry, compiled as ONE program.

    `name` must uniquely identify the combinator's computation (it keys
    the compile cache together with the leaves' shape/dtype signature).
    """
    key = (name, reverse)  # jit's own cache specializes on shapes/dtypes
    fn = _JIT_ASCAN_CACHE.get(key)
    if fn is None:
        fn = jax.jit(partial(jax.lax.associative_scan, comb,
                             reverse=reverse))
        _JIT_ASCAN_CACHE[key] = fn
    return fn(xs)
