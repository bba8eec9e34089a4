"""Columnar device blocks: the TPU-native equivalent of duckdb's Vector/DataChunk.

duckdb flows 2048-row DataChunks between interpreted operators
(/root/reference/src/include/duckdb/common/types/data_chunk.hpp:44). XLA
wants the opposite shape: big, statically-shaped arrays traced once. So a
Column here is a whole table column (or partition shard) as one padded
device array, and a Batch is a set of equal-length Columns plus one shared
row mask — the moral equivalent of duckdb's UnifiedVectorFormat
(data, validity, selection) triple, with selection kept as a mask so every
kernel stays branch-free.

Padding: lengths round up to a size bucket (multiple of 128 lanes, ~12.5%
granularity) so repeated queries over growing tables hit the jit cache.

VARCHAR columns are dictionary-encoded: `data` holds int32 codes into the
host-side `dict_values` (a sorted np.ndarray of unique strings). Sorted
dictionaries make string ORDER BY and range predicates pure code
comparisons on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_tpu.types import LogicalType, TypeId, VARCHAR


def pad_bucket(n: int) -> int:
    """Round n up to a padded capacity: multiple of 128, ~1/8 granularity."""
    if n <= 128:
        return 128
    e = max(0, (n - 1).bit_length() - 3)  # granularity 2^e gives <= 12.5% waste
    step = 1 << e
    b = ((n + step - 1) // step) * step
    return ((b + 127) // 128) * 128


@dataclass
class Column:
    """One column: padded device (or host) array + optional validity plane.

    data_hi: optional high-64-bit plane for values wider than int64
    (HUGEINT / DECIMAL(>18) sums): value = data_hi·2⁶⁴ + uint64(data).
    The reference stores these as int128 (hugeint); TPU has no native
    64-bit, so wide values ride as two int64 planes and recombine
    exactly at result materialization.
    """

    data: jax.Array  # shape (P,) padded physical values
    ltype: LogicalType
    validity: Optional[jax.Array] = None  # bool (P,); None = all valid
    dict_values: Optional[np.ndarray] = None  # VARCHAR: sorted unique strings
    data_hi: Optional[jax.Array] = None  # int64 (P,) high plane (wide values)

    @property
    def padded_len(self) -> int:
        return self.data.shape[0]

    def with_data(self, data, validity="keep") -> "Column":
        v = self.validity if validity == "keep" else validity
        return Column(data=data, ltype=self.ltype, validity=v, dict_values=self.dict_values)

    @staticmethod
    def from_numpy(
        values: np.ndarray,
        ltype: LogicalType,
        validity: Optional[np.ndarray] = None,
        dict_values: Optional[np.ndarray] = None,
        pad_to: Optional[int] = None,
        device=None,
        dtype_override=None,
    ) -> "Column":
        n = len(values)
        p = pad_to if pad_to is not None else pad_bucket(n)
        buf = np.zeros(p, dtype=dtype_override or ltype.np_dtype)
        buf[:n] = values
        data = jnp.asarray(buf)
        vmask = None
        if validity is not None:
            vbuf = np.zeros(p, dtype=np.bool_)
            vbuf[:n] = validity
            vmask = jnp.asarray(vbuf)
        return Column(data=data, ltype=ltype, validity=vmask, dict_values=dict_values)

    @staticmethod
    def from_strings(
        values: np.ndarray,
        validity: Optional[np.ndarray] = None,
        pad_to: Optional[int] = None,
    ) -> "Column":
        """Dictionary-encode a host string array into codes + sorted dict."""
        values = np.asarray(values, dtype=object)
        uniq, codes = np.unique(values.astype(str), return_inverse=True)
        return Column.from_numpy(
            codes.astype(np.int32),
            VARCHAR,
            validity=validity,
            dict_values=uniq,
            pad_to=pad_to,
        )

    def to_numpy(self, nrows: int):
        """Materialize logical values (decoded strings for VARCHAR) to host."""
        data = np.asarray(self.data)[:nrows]
        if self.ltype.id is TypeId.VARCHAR:
            out = self.dict_values[np.clip(data, 0, len(self.dict_values) - 1)]
        else:
            out = data
        valid = None
        if self.validity is not None:
            valid = np.asarray(self.validity)[:nrows]
        return out, valid


@dataclass
class Batch:
    """Equal-length columns + one shared row mask (the selection vector analog)."""

    columns: Dict[str, Column]
    nrows: int  # logical row count (<= padded_len)
    mask: Optional[jax.Array] = None  # bool (P,); None = all first-nrows rows live

    @property
    def padded_len(self) -> int:
        for c in self.columns.values():
            return c.padded_len
        return 0

    def row_mask(self) -> jax.Array:
        """Mask of live rows, always accounting for padding."""
        p = self.padded_len
        base = jnp.arange(p) < self.nrows
        if self.mask is not None:
            return jnp.logical_and(base, self.mask)
        return base

    def column(self, name: str) -> Column:
        return self.columns[name]
