"""On-disk compression schemes: exact round-trips + scheme selection.

Parity target: the reference's per-segment compression pipeline
(/root/reference/src/storage/compression/ — RLE, bitpacking, dictionary,
constant; ALP for floats). Scheme choice is by measured encoded size.
"""

import os

import numpy as np
import pytest

from duckdb_tpu.storage import compression as C


def test_constant_ints():
    a = np.full(10000, 42, dtype=np.int64)
    m, b = C.compress_ints(a)
    assert m["s"] == "const" and len(b) == 0
    np.testing.assert_array_equal(C.decompress_ints(m, b), a)


def test_for_bitpack_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.integers(1_000_000, 1_000_400, 50000).astype(np.int64)
    m, b = C.compress_ints(a)
    assert m["s"] == "for" and m["w"] <= 9
    assert len(b) < a.nbytes / 7  # ~9 bits vs 64
    np.testing.assert_array_equal(C.decompress_ints(m, b), a)


def test_for_negative_and_extremes():
    a = np.array([-(2**62), 2**62, 0, -1, 1], dtype=np.int64)
    m, b = C.compress_ints(a)
    np.testing.assert_array_equal(C.decompress_ints(m, b), a)


def test_rle_roundtrip():
    a = np.repeat(np.arange(50, dtype=np.int64) * 7, 1000)
    m, b = C.compress_ints(a)
    assert m["s"] == "rle"
    assert len(b) < 2000
    np.testing.assert_array_equal(C.decompress_ints(m, b), a)


def test_floats_roundtrip_bitexact():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(30000)
    a[::7] = np.inf
    a[3::11] = -0.0
    a[5::13] = np.nan
    m, b = C.compress_floats(a)
    got = C.decompress_floats(m, b)
    np.testing.assert_array_equal(a.view(np.uint64), got.view(np.uint64))


def test_strings_dict_roundtrip():
    dvals = np.array(["aa", "bb", "ccc", "ñ-utf8", ""], dtype=object)
    codes = np.array([0, 1, 2, 2, 3, 4, 0], dtype=np.int32)
    m, b = C.compress_strings(codes, dvals)
    c2, d2 = C.decompress_strings(m, b)
    np.testing.assert_array_equal(c2, codes)
    assert list(d2) == list(dvals)


def test_validity_roundtrip():
    v = np.random.default_rng(2).random(999) < 0.5
    assert np.array_equal(
        C.decompress_validity(C.compress_validity(v), 999), v)


def test_checkpoint_compression_e2e(tmp_path):
    """Persistence round-trip through the compressed format, with a size
    assertion: the lineitem-like table must shrink vs raw planes."""
    import duckdb_tpu
    from duckdb_tpu.api.connection import _OPEN_DBS

    db = str(tmp_path / "db")
    con = duckdb_tpu.connect(db)
    con.sql("CREATE TABLE t AS SELECT range AS id, range % 5 AS flag,"
            " range * 0.25 AS x,"
            " CASE WHEN range % 3 = 0 THEN 'alpha' WHEN range % 3 = 1"
            " THEN 'beta' ELSE NULL END AS s"
            " FROM range(50000)")
    before = con.sql("SELECT sum(id), sum(flag), sum(x), count(s) FROM t"
                     ).rows()
    con.sql("CHECKPOINT")
    raw_bytes = 50000 * (8 + 8 + 8 + 4)
    disk = sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(os.path.join(db, "data", "t"))
               for f in fs)
    assert disk < raw_bytes / 3, (disk, raw_bytes)
    _OPEN_DBS.clear()  # simulate process exit
    con2 = duckdb_tpu.connect(db)
    assert con2.sql("SELECT sum(id), sum(flag), sum(x), count(s) FROM t"
                    ).rows() == before
    assert con2.sql("SELECT s FROM t WHERE id = 3").rows() == [("alpha",)]
    assert con2.sql("SELECT s FROM t WHERE id = 2").rows() == [(None,)]
