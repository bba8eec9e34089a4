from duckdb_tpu.execution.executor import Executor, Result  # noqa: F401
