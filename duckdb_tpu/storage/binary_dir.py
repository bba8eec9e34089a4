"""Binary columnar table directory reader (dbgen_tbl output format).

Format per table dir: meta.json {rows, columns:[{name,kind}]} with
  kind i64  → <col>.i64 raw int64
  kind i32  → <col>.i32 raw int32
  kind date → <col>.i32 raw int32 (days since 1970-01-01)
  kind str  → <col>.len (u32 lengths) + <col>.bytes (utf8 payload)

Strings are dictionary-encoded on load: device data is int32 codes into a
sorted unique-value array (host-side), so string predicates evaluate once
per distinct value and comparisons/sorts stay integer ops on device.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np


def read_meta(table_dir: str) -> dict:
    with open(os.path.join(table_dir, "meta.json")) as f:
        return json.load(f)


def read_string_column(table_dir: str, name: str) -> np.ndarray:
    lens = np.fromfile(os.path.join(table_dir, f"{name}.len"), dtype=np.uint32)
    blob = np.fromfile(os.path.join(table_dir, f"{name}.bytes"), dtype=np.uint8)
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=object)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:  # every value empty (e.g. an all-NULL VARCHAR column)
        out = np.empty(n, dtype=object)
        out[:] = ""
        return out
    # Vectorized ragged→fixed-width: gather each string into a (n, maxlen)
    # byte matrix in one fancy-index op, then view rows as S{maxlen}.
    col_idx = np.arange(maxlen, dtype=np.int64)
    src = offsets[:-1, None] + col_idx[None, :]
    valid = col_idx[None, :] < lens[:, None]
    padded = np.where(valid, blob[np.minimum(src, len(blob) - 1)], 0)
    fixed = padded.astype(np.uint8).view(f"S{maxlen}").reshape(n)
    # strip the NUL padding by viewing as S{maxlen}: trailing NULs are
    # ignored by numpy bytes comparison, but decode for true strings
    return np.char.decode(fixed, "utf-8").astype(object)


def dict_encode(values: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """→ (codes int32, sorted unique values)."""
    uniq, codes = np.unique(values, return_inverse=True)
    return codes.astype(np.int32), uniq


def read_numeric_column(table_dir: str, name: str, kind: str) -> np.ndarray:
    if kind == "i64":
        return np.fromfile(os.path.join(table_dir, f"{name}.i64"), dtype=np.int64)
    if kind in ("i32", "date"):
        return np.fromfile(os.path.join(table_dir, f"{name}.i32"), dtype=np.int32)
    raise ValueError(f"unknown kind {kind}")
