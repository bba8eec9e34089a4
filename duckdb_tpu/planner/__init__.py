from duckdb_tpu.planner.planner import plan_select  # noqa: F401
