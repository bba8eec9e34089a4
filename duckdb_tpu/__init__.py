"""duckdb_tpu: a TPU-native vectorized SQL analytics engine.

A ground-up JAX/XLA/Pallas implementation of the capabilities of the
reference engine (duckdb/duckdb): SQL frontend, relational planner,
columnar device execution with collective-based parallelism.
"""

import os as _os

import jax as _jax

# SQL semantics require true 64-bit integers (BIGINT, scaled DECIMAL) and
# float64 (DOUBLE); JAX defaults to 32-bit unless x64 is enabled.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: repeated query shapes skip XLA compilation
# across processes (first compile on a tunneled TPU can take minutes).
try:
    _cache_dir = _os.path.expanduser("~/.cache/duckdb_tpu_xla")
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # persist every program: sub-0.5s compiles (most per-stage operator
    # programs) otherwise recompile in every fresh process
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # noqa: BLE001 — cache is best-effort
    pass

from duckdb_tpu.api.connection import Connection, connect  # noqa: F401,E402

# -- module-level API over a lazily-created default connection --------------
# (duckdb python parity: duckdb.sql(...) without an explicit connect();
# reference: tools/pythonpkg duckdb.sql → default_connection. The `sql`
# attribute shadows the internal duckdb_tpu.sql subpackage exactly as the
# reference's python package shadows its own.)
_default_con = None


def default_connection() -> Connection:
    global _default_con
    if _default_con is None:
        _default_con = connect()
    return _default_con


def sql(query: str):  # noqa: A001 — parity with duckdb.sql
    return default_connection().sql(query)


def query(q: str):
    return default_connection().sql(q)


def execute(q: str):
    return default_connection().sql(q)


def table(name: str):
    return default_connection().table(name)


def from_df(df, name=None):
    return default_connection().from_df(df, name)


def read_csv(path: str):
    return default_connection().sql(f"SELECT * FROM '{path}'")


def read_parquet(path: str):
    return default_connection().sql(f"SELECT * FROM '{path}'")


__version__ = "0.1.0"
