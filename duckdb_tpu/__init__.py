"""duckdb_tpu: a TPU-native vectorized SQL analytics engine.

A ground-up JAX/XLA/Pallas implementation of the capabilities of the
reference engine (duckdb/duckdb): SQL frontend, relational planner,
columnar device execution with collective-based parallelism.
"""

import jax as _jax

# SQL semantics require true 64-bit integers (BIGINT, scaled DECIMAL) and
# float64 (DOUBLE); JAX defaults to 32-bit unless x64 is enabled.
_jax.config.update("jax_enable_x64", True)

from duckdb_tpu.api.connection import Connection, connect  # noqa: F401,E402

__version__ = "0.1.0"
