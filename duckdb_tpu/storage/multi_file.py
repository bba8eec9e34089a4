"""Multi-file scans: glob expansion, schema merge, hive partitions.

Reference analog: /root/reference/src/common/multi_file/
(multi_file_function.cpp, multi_file_reader.cpp, hive partitioning in
multi_file_column_mapper.cpp) and the parquet/CSV multi-file glue in
extension/parquet/. Shaped for this engine: one merged TableEntry whose
columns concatenate per-file planes (parquet columns stay lazy per
column; CSV/JSON load per file), with dictionary codes remapped into a
union dictionary so VARCHAR stays integer ops on device.

Supported options (read_csv/read_parquet/read_json named args):
- union_by_name: merge schemas by column name; missing columns are NULL
- hive_partitioning: parse key=value path segments into columns
  (auto-detected when every file agrees on the same key set)
- filename: add the source path as a column
"""

from __future__ import annotations

import glob as _glob
import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from duckdb_tpu.types import BIGINT, VARCHAR, LogicalType, TypeId


def expand_patterns(arg) -> List[str]:
    """Path / glob / list of either → sorted file list."""
    pats = [arg] if isinstance(arg, str) else [str(p) for p in arg]
    out: List[str] = []
    for p in pats:
        p = str(p)
        if any(ch in p for ch in "*?["):
            hits = sorted(_glob.glob(p, recursive=True))
            out.extend(h for h in hits if os.path.isfile(h))
        else:
            out.append(p)
    seen = set()
    files = []
    for f in out:
        if f not in seen:
            seen.add(f)
            files.append(f)
    return files


def hive_parts(files: List[str]) -> Optional[List[Dict[str, str]]]:
    """key=value directory segments per file; None unless every file has
    the same non-empty key set (the reference's auto-detection rule)."""
    per = []
    keys0 = None
    for f in files:
        d: Dict[str, str] = {}
        for seg in f.split(os.sep)[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                if k:
                    d[k] = v
        if not d:
            return None
        ks = tuple(sorted(d))
        if keys0 is None:
            keys0 = ks
        elif ks != keys0:
            return None
        per.append(d)
    return per


def _promote(a: LogicalType, b: LogicalType) -> LogicalType:
    if a.id is b.id and getattr(a, "scale", None) == getattr(b, "scale", None):
        return a
    if a.id is TypeId.VARCHAR or b.id is TypeId.VARCHAR:
        return VARCHAR
    try:
        from duckdb_tpu.types import max_logical_type

        return max_logical_type(a, b)
    except Exception:
        return VARCHAR


def merge_schemas(schemas: List[List[Tuple[str, LogicalType]]],
                  union_by_name: bool) -> List[Tuple[str, LogicalType]]:
    if not union_by_name:
        base = list(schemas[0])
        names0 = [n for n, _ in base]
        for s in schemas[1:]:
            names = [n for n, _ in s]
            if names != names0:
                raise ValueError(
                    "schemas differ between files; pass union_by_name=true")
            for i, (_, t) in enumerate(s):
                base[i] = (base[i][0], _promote(base[i][1], t))
        return base
    order: List[str] = []
    types: Dict[str, LogicalType] = {}
    for s in schemas:
        for n, t in s:
            if n not in types:
                order.append(n)
                types[n] = t
            else:
                types[n] = _promote(types[n], t)
    return [(n, types[n]) for n in order]


def _null_part(n: int, ltype: LogicalType):
    if ltype.id is TypeId.VARCHAR:
        return (np.zeros(n, np.int32), np.zeros(n, bool),
                np.array([""], dtype=object))
    return (np.zeros(n, ltype.np_dtype), np.zeros(n, bool), None)


def _to_varchar_part(vals, valid, dvals):
    """Numeric part under a VARCHAR-promoted column → dict-encoded strings."""
    if dvals is not None:
        return vals, valid, dvals
    uniq, codes = np.unique(np.asarray(vals).astype(str), return_inverse=True)
    return codes.astype(np.int32), valid, uniq.astype(object)


def concat_parts(parts: List[Optional[Tuple]], lens: List[int],
                 ltype: LogicalType) -> Tuple:
    """Per-file (vals, valid, dvals)|None → one concatenated column."""
    datas, valids, dicts = [], [], []
    for p, n in zip(parts, lens):
        if p is None:
            p = _null_part(n, ltype)
        vals, valid, dvals = p
        if ltype.id is TypeId.VARCHAR:
            vals, valid, dvals = _to_varchar_part(vals, valid, dvals)
        elif dvals is not None:
            raise ValueError("dictionary part under non-VARCHAR column")
        if valid is None:
            valid = np.ones(n, bool)
        datas.append(np.asarray(vals))
        valids.append(valid)
        dicts.append(dvals)
    validity = np.concatenate(valids)
    if ltype.id is TypeId.VARCHAR:
        union = np.unique(np.concatenate(
            [d.astype(str) for d in dicts]))
        out = []
        for vals, d in zip(datas, dicts):
            remap = np.searchsorted(union, d.astype(str)).astype(np.int32)
            out.append(remap[np.clip(vals, 0, len(d) - 1)])
        data = np.concatenate(out)
        return data, (None if validity.all() else validity), \
            union.astype(object)
    dt = ltype.np_dtype
    data = np.concatenate([d.astype(dt) for d in datas])
    return data, (None if validity.all() else validity), None


def const_column(n_per_file: List[int], values: List[str]):
    """One value per file, repeated per file length → dict codes."""
    union = np.unique(np.array([str(v) for v in values]))
    codes = np.concatenate([
        np.full(n, np.searchsorted(union, str(v)), dtype=np.int32)
        for n, v in zip(n_per_file, values)])
    return codes, None, union.astype(object)


def partition_column(n_per_file: List[int], values: List[str]):
    """Hive partition values: BIGINT when every value parses as int."""
    try:
        ints = [int(v) for v in values]
        data = np.concatenate([np.full(n, v, dtype=np.int64)
                               for n, v in zip(n_per_file, ints)])
        return BIGINT, (data, None, None)
    except ValueError:
        return VARCHAR, const_column(n_per_file, values)


# ---------------------------------------------------------------------------
# per-file open + merged TableEntry

_CSV_CACHE: Dict[Tuple[str, float], Tuple] = {}
_CSV_CACHE_MAX = 16


class _FileSource:
    """Uniform per-file facade: schema, nrows, column(name) → part."""

    def __init__(self, path: str):
        self.path = path
        if path.endswith(".parquet"):
            import pyarrow.parquet as pq

            from duckdb_tpu.storage import parquet as pqmod

            meta = pq.read_schema(path)
            self.schema = [(f.name, pqmod._arrow_to_logical(f.type))
                           for f in meta]
            self.nrows = pq.ParquetFile(path).metadata.num_rows
            self._kind = "parquet"
        elif path.endswith((".json", ".jsonl", ".ndjson")):
            from duckdb_tpu.storage import json_io

            schema, cols, nrows = json_io.read_json_file(path)
            self.schema, self._cols, self.nrows = schema, cols, nrows
            self._kind = "json"
        else:
            key = (path, os.path.getmtime(path))
            hit = _CSV_CACHE.get(key)
            if hit is None:
                from duckdb_tpu.storage import csv as csvmod

                delim, has_header, schema = csvmod.sniff_csv(path)
                cols = csvmod.load_csv(path, schema, delim, has_header)
                first = next(iter(cols.values()), None)
                nrows = len(first[0]) if first is not None else 0
                hit = (schema, cols, nrows)
                if len(_CSV_CACHE) >= _CSV_CACHE_MAX:
                    _CSV_CACHE.pop(next(iter(_CSV_CACHE)))
                _CSV_CACHE[key] = hit
            self.schema, self._cols, self.nrows = hit
            self._kind = "csv"
        self.types = dict(self.schema)

    def column(self, name: str):
        """(vals, valid, dvals) or None when this file lacks the column."""
        if name not in self.types:
            return None
        if self._kind == "parquet":
            from duckdb_tpu.storage import parquet as pqmod

            return pqmod._load_column(self.path, name, self.types[name])
        return self._cols.get(name)


def _rescale_decimal(part, src: LogicalType, dst: LogicalType):
    vals, valid, dvals = part
    if (src.id is TypeId.DECIMAL and dst.id is TypeId.DECIMAL
            and src.scale != dst.scale):
        vals = np.asarray(vals, np.int64) * (10 ** (dst.scale - src.scale))
    return vals, valid, dvals


def _merged_column(sources: List[_FileSource], cname: str,
                   ltype: LogicalType):
    parts, lens = [], []
    for s in sources:
        p = s.column(cname)
        if p is not None and ltype.id is TypeId.DECIMAL:
            p = _rescale_decimal(p, s.types[cname], ltype)
        parts.append(p)
        lens.append(s.nrows)
    return concat_parts(parts, lens, ltype)


def build_entry(name: str, files: List[str], union_by_name: bool,
                hive: Optional[bool], filename: bool):
    """Merged TableEntry over files (lazy per column)."""
    from duckdb_tpu.catalog.catalog import ColumnDef, TableEntry

    sources = [_FileSource(f) for f in files]
    merged = merge_schemas([s.schema for s in sources], union_by_name)
    lens = [s.nrows for s in sources]
    cols = list(merged)
    hp = hive_parts(files) if hive is None or hive else None
    if hive is False:
        hp = None
    if hive and hp is None:
        # explicit hive_partitioning=true with missing or inconsistent
        # key=value path segments is an error, not a silent no-op
        # (reference: hive partition mismatch errors in
        # src/common/multi_file/multi_file_column_mapper.cpp)
        raise ValueError(
            "hive_partitioning was enabled explicitly, but the file paths "
            "do not have consistent key=value partition directories")
    extra = {}
    if hp is not None:
        taken = {n for n, _ in cols}
        for k in sorted(hp[0]):
            if k in taken:
                continue
            t, part = partition_column(lens, [d[k] for d in hp])
            cols.append((k, t))
            extra[k] = part
    if filename:
        cols.append(("filename", VARCHAR))
        extra["filename"] = const_column(lens, files)
    entry = TableEntry(name, [ColumnDef(n, t) for n, t in cols])
    entry.nrows = sum(lens)
    for cname, ltype in merged:
        entry.set_lazy_column(cname, partial(_merged_column, sources,
                                             cname, ltype))
    for cname, part in extra.items():
        entry.set_host_column(cname, part[0], validity=part[1],
                              dict_values=part[2])
    return entry
