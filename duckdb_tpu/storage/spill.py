"""Disk spill tier for out-of-core execution.

The reference spills operator state to compressed temp files managed by
TemporaryFileManager (/root/reference/src/storage/temporary_file_manager.cpp)
under `temp_directory`, with TemporaryMemoryManager arbitrating how much
each operator keeps in memory (temporary_memory_manager.cpp:28). The TPU
engine's analog: chunk partials stream column-wise into flat binary temp
files and are handed back as np.memmap arrays, so host RAM holds only one
chunk's output at a time while the OS page cache backs reads during the
merge tail. VARCHAR columns keep an append-only global dictionary (codes
stay stable as chunks arrive) that is lexicographically re-sorted with a
single LUT rewrite at finish.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Dict, List, Optional, Tuple

import numpy as np

from duckdb_tpu.types import LogicalType, TypeId


def temp_root(catalog) -> str:
    """Resolve the spill directory from the temp_directory setting; empty
    means the system temp dir."""
    mgr = getattr(catalog, "settings_manager", None)
    d = mgr.get("temp_directory", "") if mgr is not None else ""
    if not d:
        d = tempfile.gettempdir()
    os.makedirs(d, exist_ok=True)
    return d


class SpillDir:
    """A per-operation temp directory; delete() reclaims the space."""

    def __init__(self, catalog, tag: str):
        self.path = tempfile.mkdtemp(prefix=f"duckdb_tpu_{tag}_",
                                     dir=temp_root(catalog))

    def delete(self):
        shutil.rmtree(self.path, ignore_errors=True)


def _canon_dtype(t: LogicalType, sample: np.ndarray) -> np.dtype:
    if t.id is TypeId.VARCHAR:
        return np.dtype(np.int32)
    if t.id is TypeId.BOOLEAN:
        return np.dtype(np.bool_)
    if sample.dtype.kind == "f":
        return np.dtype(np.float64)
    if sample.dtype.kind == "b":
        return np.dtype(np.bool_)
    return sample.dtype  # keep native width (int32 dates, int64 bigints)


class SpillWriter:
    """Streams per-chunk result columns into flat binary files.

    append() converts each chunk to canonical dtypes and appends bytes;
    finish() returns memmap-backed (values, validity|None, dict|None)
    tuples plus the total row count.
    """

    def __init__(self, spill: SpillDir, types: List[LogicalType]):
        self.dir = spill
        self.types = types
        self.nrows = 0
        self._dtypes: List[Optional[np.dtype]] = [None] * len(types)
        self._data_f = [open(os.path.join(spill.path, f"c{i}.bin"), "wb")
                        for i in range(len(types))]
        self._valid_f = [open(os.path.join(spill.path, f"v{i}.bin"), "wb")
                         for i in range(len(types))]
        self._any_null = [False] * len(types)
        self._dicts: List[Optional[Dict[str, int]]] = [
            {} if t.id is TypeId.VARCHAR else None for t in types]

    def append(self, columns, nrows: int):
        """columns: list of (values, validity|None, dict_values|None)."""
        self.nrows += nrows
        for i, (t, (d, v, dv)) in enumerate(zip(self.types, columns)):
            d = np.asarray(d)[:nrows]
            if t.id is TypeId.VARCHAR:
                mapping = self._dicts[i]
                if dv is not None and len(dv):
                    strs = np.asarray(dv, dtype=object)[
                        np.clip(d.astype(np.int64), 0, len(dv) - 1)]
                else:
                    strs = np.full(nrows, "", dtype=object)
                uniq, inv = np.unique(strs.astype(str), return_inverse=True)
                lut = np.empty(len(uniq), np.int32)
                for j, s in enumerate(uniq):
                    code = mapping.get(s)
                    if code is None:
                        code = mapping[s] = len(mapping)
                    lut[j] = code
                codes = lut[inv].astype(np.int32)
                self._data_f[i].write(codes.tobytes())
            else:
                if self._dtypes[i] is None:
                    self._dtypes[i] = _canon_dtype(t, d)
                self._data_f[i].write(
                    np.ascontiguousarray(d.astype(self._dtypes[i],
                                                  copy=False)).tobytes())
            if v is None:
                self._valid_f[i].write(np.ones(nrows, np.bool_).tobytes())
            else:
                v = np.asarray(v)[:nrows].astype(np.bool_)
                if not v.all():
                    self._any_null[i] = True
                self._valid_f[i].write(v.tobytes())

    def finish(self) -> List[Tuple[np.ndarray, Optional[np.ndarray],
                                   Optional[np.ndarray]]]:
        cols = []
        for i, t in enumerate(self.types):
            self._data_f[i].close()
            self._valid_f[i].close()
            dpath = os.path.join(self.dir.path, f"c{i}.bin")
            if t.id is TypeId.VARCHAR:
                mapping = self._dicts[i]
                vals = np.empty(len(mapping), dtype=object)
                for s, c in mapping.items():
                    vals[c] = s
                # rewrite codes so the dict is lexicographically sorted
                # (rank LUTs and stats assume sorted dictionaries)
                order = np.argsort(vals.astype(str), kind="stable")
                remap = np.empty(len(mapping), np.int32)
                remap[order] = np.arange(len(mapping), dtype=np.int32)
                data = np.memmap(dpath, dtype=np.int32, mode="r+") \
                    if self.nrows else np.zeros(0, np.int32)
                for lo in range(0, len(data), 1 << 24):
                    data[lo:lo + (1 << 24)] = remap[data[lo:lo + (1 << 24)]]
                if self.nrows:
                    data.flush()
                dv = vals[order]
            else:
                dt = self._dtypes[i] or np.dtype(np.int64)
                data = (np.memmap(dpath, dtype=dt, mode="r")
                        if self.nrows else np.zeros(0, dt))
                dv = None
            if self._any_null[i] and self.nrows:
                valid = np.memmap(os.path.join(self.dir.path, f"v{i}.bin"),
                                  dtype=np.bool_, mode="r")
            else:
                valid = None
            cols.append((data, valid, dv))
        return cols
