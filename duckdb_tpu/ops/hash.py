"""Hashing kernels.

64-bit finalizer-style hash (splitmix64) for grouping/join keys, plus a
combine step for multi-column keys. duckdb's equivalent lives in
/root/reference/src/common/vector_operations/vector_hash.cpp; here it is a
handful of fused elementwise ops so XLA keeps it on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

_U64 = jnp.uint64


def hash64(x: jnp.ndarray) -> jnp.ndarray:
    """splitmix64 finalizer over any integer array → uint64 hash."""
    h = x.astype(jnp.int64).astype(_U64)
    h = (h ^ (h >> 30)) * _U64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> 27)) * _U64(0x94D049BB133111EB)
    h = h ^ (h >> 31)
    return h


def hash_combine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Combine two uint64 hashes (boost-style with 64-bit golden ratio)."""
    return a ^ (b + _U64(0x9E3779B97F4A7C15) + (a << 6) + (a >> 2))
