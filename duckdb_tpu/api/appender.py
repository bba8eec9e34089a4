"""Appender: buffered bulk-row ingest.

Parity target: the reference Appender (/root/reference/src/main/appender.cpp)
— append rows into an in-memory buffer, flush as columnar batches. Orders
of magnitude cheaper than per-row INSERT statements: conversion happens
once per flush, directly into the table's host columns.
"""

from __future__ import annotations

import datetime
import decimal as pydec

import numpy as np

from duckdb_tpu.types import TypeId


class Appender:
    def __init__(self, con, entry, flush_every: int = 1 << 18):
        self._con = con
        self._entry = entry
        self._rows = []
        self._flush_every = flush_every

    def append_row(self, *values):
        if len(values) != len(self._entry.columns):
            raise ValueError(
                f"appender expects {len(self._entry.columns)} values, "
                f"got {len(values)}")
        self._rows.append(values)
        if len(self._rows) >= self._flush_every:
            self.flush()

    def append_rows(self, rows):
        for r in rows:
            self.append_row(*r)

    def flush(self):
        if not self._rows:
            return
        entry = self._entry
        rows = self._rows
        self._rows = []
        cols = {}
        epoch = datetime.date(1970, 1, 1)
        for ci, cd in enumerate(entry.columns):
            t = cd.ltype
            vals = [r[ci] for r in rows]
            valid = np.array([v is not None for v in vals], dtype=bool)
            if t.id is TypeId.VARCHAR:
                strs = np.array([("" if v is None else str(v)) for v in vals],
                                dtype=object)
                uniq, codes = np.unique(strs.astype(str), return_inverse=True)
                cols[cd.name] = (codes.astype(np.int32),
                                 None if valid.all() else valid,
                                 uniq.astype(object))
            elif t.id is TypeId.DECIMAL:
                phys = np.array(
                    [0 if v is None else
                     int(pydec.Decimal(str(v)).scaleb(t.scale)) for v in vals],
                    dtype=np.int64)
                cols[cd.name] = (phys, None if valid.all() else valid, None)
            elif t.id is TypeId.DATE:
                phys = np.array(
                    [0 if v is None else (v - epoch).days for v in vals],
                    dtype=t.np_dtype)
                cols[cd.name] = (phys, None if valid.all() else valid, None)
            else:
                phys = np.array([0 if v is None else v for v in vals],
                                dtype=t.np_dtype)
                cols[cd.name] = (phys, None if valid.all() else valid, None)
        self._con._appender_flush(entry, cols, len(rows))
        self._con._plan_cache.clear()

    def close(self):
        self.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()
        return False
