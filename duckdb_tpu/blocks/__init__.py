from duckdb_tpu.blocks.column import Column, Batch, pad_bucket

__all__ = ["Column", "Batch", "pad_bucket"]
