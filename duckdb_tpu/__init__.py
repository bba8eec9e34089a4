"""duckdb_tpu: a TPU-native vectorized SQL query engine.

A brand-new analytical query engine with DuckDB's capabilities, built
TPU-first on JAX/XLA/Pallas: columnar data lives as padded SoA device
arrays in HBM, query pipelines compile to fused XLA programs, joins and
aggregates are expressed as sort/gather/segment-reduce kernels, and
multi-chip scaling rides jax.sharding meshes with collective exchanges.

Reference behavior parity target: duckdb/duckdb (see SURVEY.md).
"""

import jax

# DuckDB semantics require 64-bit integers (BIGINT, DECIMAL-as-int64) and
# float64 results. Enable x64 before any other jax use.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from duckdb_tpu.api.connection import Connection, connect  # noqa: E402

__all__ = ["connect", "Connection", "__version__"]
