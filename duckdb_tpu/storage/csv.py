"""CSV ingest: sniffer + native loader.

The reference's CSV stack is a dialect/type sniffer plus a parallel
state-machine scanner (/root/reference/src/execution/operator/csv_scanner/,
sniffer/ subdir). Here: a host-side sniffer over a sample (dialect:
delimiter candidates scored by per-row field-count consistency; types by
trial parse narrowing), then the native `csv2col` C++ loader (multithreaded
boundary-split tokenizer) emitting the binary columnar directory format the
engine maps into padded device arrays. A pure-python fallback parser covers
environments without the built tool.
"""

from __future__ import annotations

import csv as _csv
import datetime
import io
import os
import subprocess
import tempfile
from typing import Dict, List, Optional, Tuple

import numpy as np

from duckdb_tpu.types import (
    BIGINT, BOOLEAN, DATE, DOUBLE, INTEGER, TIMESTAMP, VARCHAR, LogicalType,
    TypeId, decimal,
)

_CSV2COL = os.path.join(os.path.dirname(__file__), "..", "..", "build", "csv2col")


def _is_int(s: str) -> bool:
    if not s:
        return False
    body = s[1:] if s[0] in "+-" else s
    return body.isdigit()


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _is_date(s: str) -> bool:
    try:
        datetime.date.fromisoformat(s)
        return True
    except ValueError:
        return False


def sniff_csv(path: str, sample_rows: int = 2048):
    """→ (delimiter, has_header, [(name, LogicalType)]) like duckdb's
    sniff_csv table function."""
    with open(path, "r", errors="replace") as f:
        sample = f.read(4 << 20)
    lines = sample.splitlines()[: sample_rows + 1]
    # dialect: pick the delimiter with the most consistent field count > 1
    best = (",", -1)
    for delim in (",", "|", "\t", ";"):
        counts = {}
        for ln in lines[:200]:
            n = len(next(_csv.reader([ln], delimiter=delim), []))
            counts[n] = counts.get(n, 0) + 1
        n, freq = max(counts.items(), key=lambda kv: kv[1])
        score = freq * (2 if n > 1 else 1)
        if n > 1 and score > best[1]:
            best = (delim, score)
    delim = best[0]
    rows = list(_csv.reader(io.StringIO("\n".join(lines)), delimiter=delim))
    if not rows:
        return delim, False, []
    ncol = max(len(r) for r in rows)

    def col_type(values):
        vals = [v for v in values if v != ""]
        if not vals:
            return VARCHAR
        if all(_is_int(v) for v in vals):
            return BIGINT if any(abs(int(v)) > 2**31 for v in vals) else INTEGER
        if all(_is_float(v) for v in vals):
            return DOUBLE
        if all(_is_date(v) for v in vals):
            return DATE
        if all(v.lower() in ("true", "false") for v in vals):
            return BOOLEAN
        return VARCHAR

    body_types = [col_type([r[i] for r in rows[1:] if i < len(r)])
                  for i in range(ncol)]
    header_cells = rows[0]
    header_is_data = all(
        (t.id is TypeId.VARCHAR) or (i < len(header_cells)
                                     and _matches(header_cells[i], t))
        for i, t in enumerate(body_types)
    ) and all(t.id is TypeId.VARCHAR for t in body_types)
    # header detection: first row is a header if its cells do NOT parse as
    # the column types inferred from the rest (duckdb sniffer heuristic)
    has_header = False
    for i, t in enumerate(body_types):
        cell = header_cells[i] if i < len(header_cells) else ""
        if t.id is not TypeId.VARCHAR and not _matches(cell, t):
            has_header = True
    if not has_header and all(t.id is TypeId.VARCHAR for t in body_types):
        # all-varchar: assume header if cells look like identifiers
        has_header = all(c and not c[0].isdigit() for c in header_cells)
    names = ([c.strip() or f"column{i}" for i, c in enumerate(header_cells)]
             if has_header else [f"column{i:02d}" for i in range(ncol)])
    return delim, has_header, list(zip(names, body_types))


def _matches(cell: str, t: LogicalType) -> bool:
    if cell == "":
        return True
    if t.is_integer:
        return _is_int(cell)
    if t.id is TypeId.DOUBLE:
        return _is_float(cell)
    if t.id is TypeId.DATE:
        return _is_date(cell)
    if t.id is TypeId.BOOLEAN:
        return cell.lower() in ("true", "false")
    return True


_KIND = {TypeId.BIGINT: "i64", TypeId.INTEGER: "i32", TypeId.SMALLINT: "i32",
         TypeId.TINYINT: "i32", TypeId.DOUBLE: "f64", TypeId.FLOAT: "f64",
         TypeId.DATE: "date", TypeId.VARCHAR: "str", TypeId.BOOLEAN: "i32"}


def _kind_of(t: LogicalType) -> str:
    # DECIMAL → dec<scale>: csv2col parses decimal text exactly in integer
    # arithmetic (no float64 round-trip; exactness would break past 2^53,
    # i.e. DECIMAL wider than 15 digits)
    if t.id is TypeId.DECIMAL:
        return f"dec{t.scale}"
    return _KIND[t.id]


def parse_decimal_text(c: str, scale: int) -> int:
    """Exact decimal text → scaled int (integer arithmetic, round-half-up)."""
    c = c.strip()
    neg = c.startswith("-")
    if c and c[0] in "+-":
        c = c[1:]
    if "e" in c or "E" in c:  # scientific notation: exact via Decimal
        import decimal as pydec

        v = int(pydec.Decimal(c).scaleb(scale).to_integral_value(
            rounding=pydec.ROUND_HALF_UP))
        return -v if neg else v
    whole, _, frac = c.partition(".")
    v = int((whole or "0") + (frac + "0" * scale)[:scale])
    if len(frac) > scale and frac[scale] >= "5":
        v += 1
    return -v if neg else v


def load_csv(path: str, schema: List[Tuple[str, LogicalType]], delim: str,
             has_header: bool) -> Dict[str, tuple]:
    """→ {colname: (values np, validity|None, dict_values|None)} per schema."""
    if os.path.exists(_CSV2COL):
        return _load_native(path, schema, delim, has_header)
    return _load_python(path, schema, delim, has_header)


def _load_native(path, schema, delim, has_header):
    from duckdb_tpu.storage import binary_dir

    spec = ",".join(f"{n}:{_kind_of(t)}" for n, t in schema)
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            [_CSV2COL, path, tmp, spec, "--delim", delim, "--header",
             "1" if has_header else "0"],
            check=True, capture_output=True,
        )
        out = {}
        for n, t in schema:
            kind = _kind_of(t)
            validity = None
            vp = os.path.join(tmp, f"{n}.valid")
            if os.path.exists(vp):
                validity = np.fromfile(vp, dtype=np.uint8).astype(bool)
            if kind == "str":
                values = binary_dir.read_string_column(tmp, n)
                codes, uniq = binary_dir.dict_encode(values)
                out[n] = (codes, validity, uniq)
            elif kind == "f64":
                v = np.fromfile(os.path.join(tmp, f"{n}.f64"), dtype=np.float64)
                out[n] = (v, validity, None)
            elif kind == "i64" or kind.startswith("dec"):
                out[n] = (np.fromfile(os.path.join(tmp, f"{n}.i64"),
                                      dtype=np.int64), validity, None)
            else:
                v = np.fromfile(os.path.join(tmp, f"{n}.i32"), dtype=np.int32)
                out[n] = (v.astype(t.np_dtype), validity, None)
        return out


def _load_python(path, schema, delim, has_header):
    from duckdb_tpu.storage import binary_dir

    with open(path, newline="") as f:
        rows = list(_csv.reader(f, delimiter=delim))
    if has_header and rows:
        rows = rows[1:]
    epoch = datetime.date(1970, 1, 1)
    out = {}
    for i, (n, t) in enumerate(schema):
        cells = [r[i] if i < len(r) else "" for r in rows]
        validity = np.array([c != "" for c in cells], dtype=bool)
        if t.id is TypeId.VARCHAR:
            codes, uniq = binary_dir.dict_encode(np.array(cells, dtype=object))
            out[n] = (codes, None if validity.all() else validity, uniq)
            continue
        if t.id is TypeId.DATE:
            vals = np.array([(datetime.date.fromisoformat(c) - epoch).days
                             if c else 0 for c in cells], dtype=np.int32)
        elif t.id is TypeId.DECIMAL:
            vals = np.array([parse_decimal_text(c, t.scale) if c else 0
                             for c in cells], dtype=np.int64)
        elif t.is_float:
            vals = np.array([float(c) if c else 0 for c in cells],
                            dtype=np.float64)
        elif t.id is TypeId.BOOLEAN:
            vals = np.array([c.lower() == "true" for c in cells], dtype=bool)
        else:
            vals = np.array([int(c) if c else 0 for c in cells],
                            dtype=t.np_dtype)
        out[n] = (vals, None if validity.all() else validity, None)
    return out


def write_csv(path: str, names, rows, delim: str = ",", header: bool = True):
    with open(path, "w", newline="") as f:
        w = _csv.writer(f, delimiter=delim)
        if header:
            w.writerow(names)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])
