"""Arrow interop: zero-copy columnar export/import + streaming fetch.

Reference: src/common/arrow/ (ArrowConverter, ArrowAppender,
arrow_query_result) and the python client's fetch_record_batch. The
engine's Result already holds host numpy planes (values, validity,
dictionary), which map onto Arrow buffers without row materialization:
ints/floats wrap as zero-copy primitive arrays, VARCHAR dictionary codes
become DictionaryArray (shared dictionary buffer), DECIMAL scaled int64
lifts to decimal128, DATE/TIMESTAMP map to date32/timestamp('us').
"""

from __future__ import annotations

import numpy as np

from duckdb_tpu.types import LogicalType, TypeId


def _pa():
    import pyarrow as pa
    return pa


def _column_to_arrow(vals, valid, dvals, t: LogicalType):
    pa = _pa()
    mask = None if valid is None else ~np.ascontiguousarray(valid)
    vals = np.ascontiguousarray(vals)
    if t.id is TypeId.VARCHAR:
        if dvals is None:
            return pa.array(["" for _ in range(len(vals))], pa.string(),
                            mask=mask)
        codes = pa.array(np.clip(vals.astype(np.int32), 0,
                                 max(len(dvals) - 1, 0)), mask=mask)
        return pa.DictionaryArray.from_arrays(
            codes, pa.array([str(x) for x in dvals], pa.string()))
    if t.id is TypeId.BOOLEAN:
        return pa.array(vals.astype(np.bool_), pa.bool_(), mask=mask)
    if t.id is TypeId.DECIMAL or t.id is TypeId.HUGEINT:
        # decimal128 stores the UNSCALED integer as 16-byte little-endian
        # two's complement — exactly the engine's scaled-int64 encoding,
        # so build the buffers directly (a plain int->decimal cast would
        # multiply the value by 10^scale)
        pair = np.empty((len(vals), 2), dtype="<i8")
        if vals.dtype == object:
            # wide-sum results beyond int64 arrive as python ints
            m64 = (1 << 64) - 1
            pair[:, 0] = np.array(
                [np.uint64((int(v) if v is not None else 0) & m64)
                 for v in vals]).astype(np.int64)
            pair[:, 1] = [(int(v) if v is not None else 0) >> 64
                          for v in vals]
        else:
            ints = vals.astype(np.int64)
            pair[:, 0] = ints
            pair[:, 1] = ints >> 63  # sign extension into the high half
        data = pa.py_buffer(pair.tobytes())
        if valid is None:
            bitmap, nulls = None, 0
        else:
            bitmap = pa.py_buffer(
                np.packbits(valid, bitorder="little").tobytes())
            nulls = int((~valid).sum())
        if t.id is TypeId.HUGEINT:
            # reference exports HUGEINT as decimal128(38, 0)
            # (src/common/arrow/arrow_converter.cpp)
            atype = pa.decimal128(38, 0)
        else:
            atype = pa.decimal128(max(getattr(t, "width", 18) or 18, 1),
                                  t.scale or 0)
        return pa.Array.from_buffers(
            atype, len(vals), [bitmap, data], null_count=nulls)
    if t.id is TypeId.DATE:
        return pa.array(vals.astype(np.int32), pa.date32(), mask=mask)
    if t.id is TypeId.TIMESTAMP:
        return pa.array(vals.astype(np.int64), pa.timestamp("us"),
                        mask=mask)
    if t.id is TypeId.TIME:
        return pa.array(vals.astype(np.int64), pa.time64("us"), mask=mask)
    if t.id is TypeId.INTERVAL:
        return pa.array(vals.astype(np.int64), pa.duration("us"), mask=mask)
    if t.is_float:
        return pa.array(vals.astype(np.float64), mask=mask)
    if vals.dtype.kind in "iu":
        return pa.array(vals, mask=mask)
    return pa.array(vals.tolist(), mask=mask)


def result_to_arrow(res):
    """pyarrow.Table over the Result's host planes (no row loop)."""
    pa = _pa()
    arrays, fields = [], []
    for name, t, (vals, valid, dvals) in zip(res.names, res.types,
                                             res.columns):
        try:
            arr = _column_to_arrow(np.asarray(vals)[:res.nrows],
                                   None if valid is None
                                   else np.asarray(valid)[:res.nrows],
                                   dvals, t)
        except Exception:
            # nested/exotic types: row path fallback
            col = [r for r in (row[len(fields)] for row in res.rows())]
            arr = pa.array(col)
        arrays.append(arr)
        fields.append(pa.field(name, arr.type))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def result_record_batch_reader(res, rows_per_batch: int = 1_000_000):
    """Streaming fetch: pyarrow.RecordBatchReader in fixed-size slices
    (python API parity: duckdb fetch_record_batch)."""
    pa = _pa()
    tbl = result_to_arrow(res)

    def gen():
        for lo in range(0, max(tbl.num_rows, 1), rows_per_batch):
            for b in tbl.slice(lo, rows_per_batch).to_batches():
                yield b

    return pa.RecordBatchReader.from_batches(tbl.schema, gen())


def arrow_to_columns(tbl):
    """pyarrow Table/RecordBatchReader → [(name, ltype, values, validity,
    dict_values)] engine host planes (dictionary-encoded strings keep
    their codes)."""
    import pyarrow as pa

    from duckdb_tpu.types import (BIGINT, BOOLEAN, DATE, DOUBLE, INTEGER,
                                  TIMESTAMP, VARCHAR, decimal)

    if isinstance(tbl, pa.RecordBatchReader):
        tbl = tbl.read_all()
    if isinstance(tbl, pa.RecordBatch):
        tbl = pa.Table.from_batches([tbl])
    out = []
    for name, col in zip(tbl.column_names, tbl.columns):
        col = col.combine_chunks()
        ty = col.type
        valid = (None if col.null_count == 0
                 else np.asarray(col.is_valid()))
        if pa.types.is_dictionary(ty):
            codes = np.asarray(col.indices.fill_null(0)).astype(np.int32)
            dvals = np.array([str(x) for x in col.dictionary.to_pylist()],
                             dtype=object)
            out.append((name, VARCHAR, codes, valid, dvals))
            continue
        if pa.types.is_string(ty) or pa.types.is_large_string(ty):
            svals = np.array(["" if v is None else v
                              for v in col.to_pylist()], dtype=object)
            uniq, codes = np.unique(svals.astype(str), return_inverse=True)
            out.append((name, VARCHAR, codes.astype(np.int32), valid,
                        uniq.astype(object)))
            continue
        if pa.types.is_boolean(ty):
            out.append((name, BOOLEAN,
                        np.asarray(col.fill_null(False)), valid, None))
            continue
        if pa.types.is_decimal(ty):
            t = decimal(ty.precision, ty.scale)
            vals = np.array([0 if v is None else int(v.scaleb(ty.scale))
                             for v in col.to_pylist()], dtype=np.int64)
            out.append((name, t, vals, valid, None))
            continue
        if pa.types.is_date(ty):
            arr = col.cast(pa.date32()).fill_null(0)
            out.append((name, DATE,
                        np.asarray(arr).astype("datetime64[D]")
                        .astype(np.int32), valid, None))
            continue
        if pa.types.is_timestamp(ty):
            arr = col.cast(pa.timestamp("us")).fill_null(0)
            out.append((name, TIMESTAMP,
                        np.asarray(arr).astype("datetime64[us]")
                        .astype(np.int64), valid, None))
            continue
        if pa.types.is_floating(ty):
            out.append((name, DOUBLE,
                        np.asarray(col.cast(pa.float64()).fill_null(0.0)),
                        valid, None))
            continue
        if pa.types.is_integer(ty):
            np_vals = np.asarray(col.fill_null(0))
            t = INTEGER if np_vals.dtype.itemsize <= 4 else BIGINT
            out.append((name, t, np_vals.astype(
                np.int32 if t is INTEGER else np.int64), valid, None))
            continue
        # anything else: python objects through the VARCHAR path
        svals = np.array([("" if v is None else str(v))
                          for v in col.to_pylist()], dtype=object)
        uniq, codes = np.unique(svals.astype(str), return_inverse=True)
        out.append((name, VARCHAR, codes.astype(np.int32), valid,
                    uniq.astype(object)))
    return out, tbl.num_rows
