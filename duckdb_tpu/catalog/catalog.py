"""Catalog: schemas, tables, column metadata, and device residency.

The reference keeps a versioned MVCC CatalogSet
(/root/reference/src/catalog/). Round 1 is a single-version in-memory
catalog; versioning arrives with the transaction layer. Column data is
host-resident numpy (the "disk tier") and promoted lazily to padded device
arrays (the HBM cache tier) on first query touch — the TPU analog of
buffer-pool pinning. A process-wide DeviceBufferPool enforces the
`memory_limit` setting with LRU eviction (the reference's BufferManager,
src/storage/standard_buffer_manager.cpp): evicted columns drop their HBM
copy and re-promote from the host tier on next touch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from duckdb_tpu.blocks import Column, pad_bucket
from duckdb_tpu.types import LogicalType, TypeId, VARCHAR


class DeviceBufferPool:
    """LRU accounting of device-resident column bytes (BufferManager analog)."""

    def __init__(self, limit_bytes: int = 0):
        self.limit = limit_bytes  # 0 = unlimited
        self.used = 0
        self._clock = 0
        # (entry, name) → (bytes, last_touch)
        self._resident: Dict[tuple, list] = {}

    def touch(self, entry, name, nbytes):
        self._clock += 1
        key = (id(entry), name)
        if key in self._resident:
            self._resident[key][1] = self._clock
            return
        self._resident[key] = [nbytes, self._clock, entry, name]
        self.used += nbytes
        self._maybe_evict()

    def release(self, entry, name):
        key = (id(entry), name)
        rec = self._resident.pop(key, None)
        if rec:
            self.used -= rec[0]

    def _maybe_evict(self):
        if not self.limit:
            return
        while self.used > self.limit and len(self._resident) > 1:
            victim = min(self._resident.values(), key=lambda r: r[1])
            _, _, entry, name = victim
            entry._device.pop(name, None)
            self.release(entry, name)

    def evict_all(self):
        """Drop every device-resident column (OOM recovery: columns
        re-promote from the host tier on next touch)."""
        for rec in list(self._resident.values()):
            _, _, entry, name = rec
            entry._device.pop(name, None)
        self._resident.clear()
        self.used = 0


POOL = DeviceBufferPool()


def set_memory_limit(limit_bytes: int):
    POOL.limit = limit_bytes
    POOL._maybe_evict()


@dataclass
class ColumnStats:
    min_val: Optional[object] = None
    max_val: Optional[object] = None
    n_unique: Optional[int] = None
    has_nulls: bool = False


@dataclass
class ColumnDef:
    name: str
    ltype: LogicalType


class TableEntry:
    def __init__(self, name: str, columns: List[ColumnDef]):
        self.name = name
        self.columns = columns
        self.col_types: Dict[str, LogicalType] = {c.name: c.ltype for c in columns}
        self.nrows: int = 0
        # host tier: name -> (np values, np validity|None); VARCHAR stored as
        # (codes, dict) pair
        self._host: Dict[str, Tuple] = {}
        self._loaders: Dict[str, Callable[[], Tuple]] = {}
        # device tier
        self._device: Dict[str, Column] = {}
        self.stats: Dict[str, ColumnStats] = {}
        # ("not_null", col) / ("primary_key"|"unique", [cols]) /
        # ("check", sql_text) — enforced on append (reference:
        # src/storage/table/row_group_collection.cpp VerifyAppendConstraints)
        self.constraints: List[tuple] = []
        # column DEFAULT expressions as raw SQL text (re-parsed on use;
        # the reference serializes bound defaults the same way)
        self.defaults: dict = {}

    def clone(self) -> "TableEntry":
        """Snapshot copy for transaction versioning (the reference's analog
        is the UndoBuffer + versioned CatalogSet,
        src/transaction/undo_buffer.cpp). Host arrays are immutable by
        convention (every DML path builds new arrays and calls
        set_host_column), so a shallow dict copy suffices — copy-on-write at
        zero array cost."""
        new = TableEntry(self.name,
                         [ColumnDef(c.name, c.ltype) for c in self.columns])
        new.nrows = self.nrows
        new._host = dict(self._host)
        new._loaders = dict(self._loaders)
        new.stats = dict(self.stats)
        new.constraints = list(self.constraints)
        new.defaults = dict(self.defaults)
        # own device dict, shared Column objects: untouched columns stay
        # HBM-resident (one allocation, two refs) while a set_host_column on
        # either side invalidates only that side's cache — sharing the dict
        # itself would let one side re-promote stale planes into the other
        new._device = dict(self._device)
        # carry the mutation counter so version-keyed caches stay coherent
        # across snapshot publication
        new.version = getattr(self, "version", 0)
        # the persistent unique-key index (ART analog) is shared BY
        # REFERENCE and version-validated: a successful append on the clone
        # advances it in place, transferring it to the newest version; any
        # other lineage sees a version mismatch and rebuilds
        if "_uniq_indexes" in self.__dict__:
            new._uniq_indexes = self.__dict__["_uniq_indexes"]
        return new

    # -- population -----------------------------------------------------------
    def set_host_column(self, name, values, validity=None, dict_values=None):
        self._host[name] = (values, validity, dict_values)
        if self._device.pop(name, None) is not None:
            POOL.release(self, name)
        self._compute_stats(name)
        # invalidate version-keyed caches (join build tables, composite
        # uniqueness) on any column mutation
        self.version = getattr(self, "version", 0) + 1

    def set_lazy_column(self, name, loader: Callable[[], Tuple]):
        """loader() -> (values, validity, dict_values)"""
        self._loaders[name] = loader

    def host_column(self, name):
        if name not in self._host and name in self._loaders:
            values, validity, dict_values = self._loaders.pop(name)()
            self._host[name] = (values, validity, dict_values)
            self._compute_stats(name)
        return self._host[name]

    def device_column(self, name) -> Column:
        if name not in self._device:
            values, validity, dict_values = self.host_column(name)
            ltype = self.col_types[name]
            pad = pad_bucket(self.nrows)
            # width narrowing: store int64-typed columns as int32 planes when
            # the zone-map range fits — halves HBM residency and, on
            # virtualized devices that re-stream inputs per call, halves the
            # per-query transfer (compute still widens to int64 in-trace)
            if (np.dtype(ltype.np_dtype) == np.int64 and len(values)):
                st = self.stats_for(name)
                if (st.min_val is not None and st.max_val is not None
                        and -2**31 < int(st.min_val)
                        and int(st.max_val) < 2**31 - 1):
                    values = values.astype(np.int32)
            col = Column.from_numpy(
                values, ltype, validity=validity, dict_values=dict_values,
                pad_to=pad, dtype_override=values.dtype,
            )
            self._device[name] = col
            nbytes = int(col.data.size) * col.data.dtype.itemsize
            if col.validity is not None:
                nbytes += int(col.validity.size)
            POOL.touch(self, name, nbytes)
        else:
            POOL.touch(self, name, 0)
        return self._device[name]

    def _compute_stats(self, name):
        values, validity, dict_values = self._host[name]
        st = ColumnStats()
        ltype = self.col_types[name]
        if len(values):
            if validity is not None:
                st.has_nulls = bool(np.any(~validity))
                live = values[validity] if st.has_nulls else values
            else:
                live = values
            if len(live):
                if ltype.id is TypeId.VARCHAR:
                    st.n_unique = len(dict_values) if dict_values is not None else None
                    st.min_val = int(live.min())
                    st.max_val = int(live.max())
                else:
                    try:
                        mn, mx = live.min(), live.max()
                        # object-dtype planes (materialized intermediates)
                        # yield plain python scalars; numeric ones .item()
                        st.min_val = mn.item() if hasattr(mn, "item") else mn
                        st.max_val = mx.item() if hasattr(mx, "item") else mx
                    except TypeError:
                        pass  # unorderable entries: no zone-map stats
        self.stats[name] = st

    def stats_for(self, name) -> ColumnStats:
        if name not in self.stats:
            self.host_column(name)  # force load to compute
        return self.stats.get(name, ColumnStats())

    def distinct_count(self, name) -> int:
        """Exact distinct count, computed lazily and cached (the reference
        keeps HLL estimates in table stats; exact is affordable host-side
        and lets PK-ness skip runtime uniqueness checks in joins)."""
        st = self.stats_for(name)
        if st.n_unique is None:
            values, validity, dvals = self.host_column(name)
            live = values if validity is None else values[validity]
            st.n_unique = int(len(np.unique(live)))
        return st.n_unique

    def composite_unique(self, names: Tuple[str, ...]) -> bool:
        """True if the column tuple is row-unique (composite-PK analog).

        Computed host-side once per (columns, nrows) and cached — lets
        multi-key joins against a composite-key table skip runtime
        duplicate checks (the mid-join host syncs). Invalidation rides on
        nrows, matching the engine's other per-version caches."""
        key = (tuple(sorted(names)), self.nrows, getattr(self, "version", 0))
        cache = self.__dict__.setdefault("_composite_unique", {})
        if key not in cache:
            cols = [self.host_column(n)[0][:self.nrows] for n in names]
            arr = np.rec.fromarrays(cols) if cols else None
            cache[key] = (arr is not None
                          and len(np.unique(arr)) == self.nrows)
        return cache[key]


def qualify(name: str) -> str:
    """Catalog key for a (possibly schema-qualified) object name: lowered,
    with the default schema prefix stripped ("main.t" ≡ "t"). Literal dots
    inside quoted identifiers arrive \x02-escaped from the parser and are
    restored here, so only structural qualification dots split. Reference:
    schema resolution in src/catalog/default/default_schemas.cpp."""
    key = name.lower()
    if key.startswith("main."):
        key = key[5:]
    return key.replace("\x02", ".")


class Catalog:
    def __init__(self):
        self.tables: Dict[str, TableEntry] = {}
        self.views: Dict[str, object] = {}  # name -> parsed SELECT AST
        self.sequences: Dict[str, dict] = {}  # name -> {value, increment}
        from duckdb_tpu.planner.macros import default_macros

        # name -> macros.MacroDef; seeded with the built-in default macros
        # (reference: src/catalog/default/default_functions.cpp)
        self.macros: Dict[str, object] = default_macros()
        self.table_macros: Dict[str, object] = {}  # CREATE MACRO ... AS TABLE
        self.schemas = {"main"}  # CREATE SCHEMA registry
        # CREATE TYPE registry: name -> {"kind": "enum", "values": [...]} |
        # {"kind": "alias", "base": str, "mods": [...]}
        self.user_types: Dict[str, dict] = {}
        self.attached: Dict[str, dict] = {}  # alias -> {path, read_only}
        self._file_tables: Dict[tuple, str] = {}  # (path, mtime) -> table name
        # CREATE INDEX registry: name -> {table, exprs, unique, sql}
        # (metadata + UNIQUE constraints; reference: ART catalog entries)
        self.indexes: Dict[str, dict] = {}
        # COMMENT ON storage: ("table", name) / ("column", table, col) /
        # (kind, name) -> text|None (reference: comment_on statement)
        self.comments: Dict[tuple, object] = {}

    def ensure_file_table(self, path, union_by_name: bool = False,
                          hive_partitioning=None,
                          filename: bool = False) -> str:
        """Register CSV/parquet/JSON file(s) as a scannable table
        (replacement scan, `SELECT * FROM 'file.csv'`). Accepts a single
        path, a glob pattern, or a list of either; multi-file scans merge
        schemas (union_by_name), detect hive key=value partitions, and can
        add a filename column (reference: src/common/multi_file/)."""
        import os

        from duckdb_tpu.storage import multi_file as mf

        files = mf.expand_patterns(path)
        if not files:
            raise ValueError(f'No files found that match the pattern "{path}"')
        opts = (union_by_name, bool(hive_partitioning), filename)
        # single literal files still auto-detect hive partitions from
        # their path (reference auto-detects for single files too)
        auto_hive = (hive_partitioning is None
                     and mf.hive_parts(files) is not None)
        if len(files) > 1 or opts != (False, False, False) or auto_hive \
                or files[0] != (path if isinstance(path, str) else None):
            key = (tuple(os.path.abspath(f) for f in files),
                   tuple(os.path.getmtime(f) for f in files),
                   union_by_name,
                   None if hive_partitioning is None else bool(hive_partitioning),
                   filename)
            if key in self._file_tables:
                return self._file_tables[key]
            name = f"__file_{len(self._file_tables)}"
            entry = mf.build_entry(name, files, union_by_name,
                                   hive_partitioning, filename)
            self.create_table(entry, or_replace=True)
            self._file_tables[key] = name
            return name
        path = files[0]
        mtime = os.path.getmtime(path)
        key = (os.path.abspath(path), mtime)
        if key in self._file_tables:
            return self._file_tables[key]
        name = f"__file_{len(self._file_tables)}"
        if path.endswith(".parquet"):
            from duckdb_tpu.storage import parquet as pq

            entry = pq.parquet_table_entry(name, path)
        elif path.endswith((".json", ".jsonl", ".ndjson")):
            from duckdb_tpu.storage import json_io

            schema, cols, nrows = json_io.read_json_file(path)
            entry = TableEntry(name, [ColumnDef(n, t) for n, t in schema])
            entry.nrows = nrows
            for cname, (vals, valid, dvals) in cols.items():
                entry.set_host_column(cname, vals, validity=valid,
                                      dict_values=dvals)
        else:
            from duckdb_tpu.storage import csv as csvmod

            delim, has_header, schema = csvmod.sniff_csv(path)
            cols = csvmod.load_csv(path, schema, delim, has_header)
            entry = TableEntry(name, [ColumnDef(n, t) for n, t in schema])
            first = next(iter(cols.values()), None)
            entry.nrows = len(first[0]) if first is not None else 0
            for cname, (vals, valid, dvals) in cols.items():
                entry.set_host_column(cname, vals, validity=valid,
                                      dict_values=dvals)
        self.create_table(entry, or_replace=True)
        self._file_tables[key] = name
        return name

    def create_table(self, entry: TableEntry, or_replace: bool = False):
        raw = entry.name.lower()
        if "." in raw.replace("\x02", ""):  # structural qualification only
            schema = raw.split(".", 1)[0].replace("\x02", ".")
            if schema not in getattr(self, "schemas", {"main"}):
                raise ValueError(
                    f'Catalog Error: Schema with name {schema} does not '
                    "exist!")
        key = qualify(entry.name)
        entry.name = key
        if key in self.tables and not or_replace:
            raise ValueError(f'table "{entry.name}" already exists')
        self.tables[key] = entry

    def drop_table(self, name: str, if_exists: bool = False):
        key = qualify(name)
        if key in self.tables:
            entry = self.tables[key]
            for col in list(entry._device):
                POOL.release(entry, col)
            del self.tables[key]
        elif not if_exists:
            raise ValueError(f'table "{name}" does not exist')

    def get_table(self, name: str) -> TableEntry:
        key = qualify(name)
        if key not in self.tables:
            raise ValueError(f'Table with name {name} does not exist!')
        return self.tables[key]

    def has_table(self, name: str) -> bool:
        return qualify(name) in self.tables
