from duckdb_tpu.catalog.catalog import Catalog, TableEntry, ColumnDef

__all__ = ["Catalog", "TableEntry", "ColumnDef"]
