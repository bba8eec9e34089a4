from duckdb_tpu.sql.parser import parse_sql

__all__ = ["parse_sql"]
