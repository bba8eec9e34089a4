"""Parquet read/write via Arrow.

Parity target: the reference's parquet extension
(/root/reference/extension/parquet/ — reader with per-column lazy loads,
writer). Arrow provides the codec layer (like the reference vendors
thrift/parquet); the engine-side work is the columnar mapping: Arrow
columns → dictionary-encoded / scaled-int padded device planes, loaded
lazily per column so untouched columns never leave disk.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import numpy as np

from duckdb_tpu.catalog.catalog import ColumnDef, TableEntry
from duckdb_tpu.types import (
    BIGINT, BOOLEAN, DATE, DOUBLE, FLOAT, INTEGER, SMALLINT, TIMESTAMP,
    TINYINT, VARCHAR, LogicalType, TypeId, decimal,
)


def _arrow_to_logical(t) -> LogicalType:
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return BOOLEAN
    if pa.types.is_int8(t):
        return TINYINT
    if pa.types.is_int16(t):
        return SMALLINT
    if pa.types.is_int32(t):
        return INTEGER
    if pa.types.is_int64(t) or pa.types.is_unsigned_integer(t):
        return BIGINT
    if pa.types.is_float32(t):
        return FLOAT
    if pa.types.is_float64(t):
        return DOUBLE
    if pa.types.is_decimal(t):
        return decimal(t.precision, t.scale)
    if pa.types.is_date(t):
        return DATE
    if pa.types.is_timestamp(t):
        return TIMESTAMP
    return VARCHAR


def _load_column(path: str, name: str, ltype: LogicalType):
    import pyarrow.parquet as pq

    table = pq.read_table(path, columns=[name])
    arr = table.column(0).combine_chunks()
    validity = None
    if arr.null_count:
        validity = np.asarray(arr.is_valid())
    if ltype.id is TypeId.VARCHAR:
        vals = arr.to_pandas().astype(object)
        vals = np.array(["" if v is None else str(v) for v in vals],
                        dtype=object)
        uniq, codes = np.unique(vals.astype(str), return_inverse=True)
        return codes.astype(np.int32), validity, uniq.astype(object)
    if ltype.id is TypeId.DECIMAL:
        import pyarrow as pa

        ints = np.array([0 if v is None else int(v.as_py().scaleb(ltype.scale))
                         for v in arr], dtype=np.int64)
        return ints, validity, None
    if ltype.id is TypeId.DATE:
        days = np.asarray(arr.cast("int32").fill_null(0))
        return days.astype(np.int32), validity, None
    if ltype.id is TypeId.TIMESTAMP:
        import pyarrow as pa

        micros = np.asarray(arr.cast(pa.timestamp("us")).cast("int64")
                            .fill_null(0))
        return micros.astype(np.int64), validity, None
    np_vals = np.asarray(arr.fill_null(0))
    return np_vals.astype(ltype.np_dtype), validity, None


def parquet_table_entry(name: str, path: str) -> TableEntry:
    """Schema-only open; columns load lazily on first touch."""
    import pyarrow.parquet as pq

    meta = pq.read_schema(path)
    cols = [ColumnDef(f.name, _arrow_to_logical(f.type)) for f in meta]
    entry = TableEntry(name, cols)
    entry.nrows = pq.ParquetFile(path).metadata.num_rows
    for cd in cols:
        entry.set_lazy_column(cd.name, partial(_load_column, path, cd.name,
                                               cd.ltype))
    return entry


def write_parquet(path: str, names, types, result_columns, nrows: int):
    """Write a Result's columns to parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    arrays = []
    for (vals, valid, dvals), t in zip(result_columns, types):
        mask = None if valid is None else ~valid
        if t.id is TypeId.VARCHAR:
            strs = [None if (valid is not None and not valid[i])
                    else str(dvals[vals[i]]) for i in range(nrows)]
            arrays.append(pa.array(strs, type=pa.string()))
        elif t.id is TypeId.DECIMAL:
            import decimal as pydec

            dec = [None if (valid is not None and not valid[i])
                   else pydec.Decimal(int(vals[i])).scaleb(-t.scale)
                   for i in range(nrows)]
            arrays.append(pa.array(dec, type=pa.decimal128(max(t.width, 18),
                                                           t.scale)))
        elif t.id is TypeId.DATE:
            arrays.append(pa.array(np.asarray(vals[:nrows], dtype=np.int32),
                                   type=pa.date32(), mask=mask))
        else:
            arrays.append(pa.array(np.asarray(vals[:nrows]), mask=mask))
    pq.write_table(pa.table(dict(zip(names, arrays))), path)
