"""Device-side string matching over packed dictionary byte planes.

The engine's VARCHAR columns are int32 codes into a per-column dictionary
(host side). String predicates used to run as a PYTHON loop over distinct
values (fine for low-cardinality columns, a multi-second host stall for
near-unique ones: lineitem.l_comment has ~4.5M distinct values at SF1).

This module packs a dictionary once into a device byte plane
``[n_distinct, max_len] uint8`` (+ lengths) and evaluates LIKE patterns of
the form ``seg0 % seg1 % ... % segk`` (literal segments, ``%`` wildcards —
the overwhelmingly common shape, e.g. every TPC-H LIKE) as vectorized
shifted-window comparisons on the VPU: greedy leftmost matching of the
segments in order, which is complete for existence queries. Patterns with
``_``, escapes, or non-ASCII fall back to the host regex loop.

Reference analog: string_t + LIKE operators
(/root/reference/src/include/duckdb/common/types/string_type.hpp:28-30,
src/function/scalar/string/like.cpp) — re-shaped columnar: one plane
comparison per (segment byte) instead of one function call per row.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# dictionary plane cache: id(dict_values) → (weak sentinel, plane, lens)
_PLANE_CACHE: dict = {}
_PLANE_CACHE_MAX = 8

# (id(dict_values), pattern, ci) → np.bool_ LUT
_LIKE_LUT_CACHE: dict = {}
_LIKE_LUT_CACHE_MAX = 64

# below this cardinality the host loop is cheap and avoids device work
DEVICE_LIKE_MIN_DICT = 4096


def _pack_dict(dvals: np.ndarray) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """dict strings → (uint8 plane [n, L] zero-padded, lengths [n]).

    Returns None when the dictionary contains non-ASCII codepoints (the
    UTF-32 view trick only maps 1:1 to bytes for ASCII; callers fall back
    to the host path). Embedded NUL bytes would mis-measure lengths — such
    dictionaries are rejected too (codepoint 0 only as padding)."""
    key = id(dvals)
    hit = _PLANE_CACHE.get(key)
    if hit is not None and hit[0] is dvals:
        return hit[1], hit[2]
    u = dvals.astype("U")  # fixed-width UTF-32, zero-padded
    n = len(u)
    if n == 0:
        return None
    width = u.dtype.itemsize // 4
    if width == 0:
        return None
    cp = np.ascontiguousarray(u).view(np.uint32).reshape(n, width)
    if cp.max(initial=0) > 127:
        return None
    lens = (cp != 0).sum(axis=1).astype(np.int32)
    # reject embedded NULs: length must equal the position of the first 0
    first_zero = np.argmax(cp == 0, axis=1)
    full = (cp != 0).all(axis=1)
    if not np.array_equal(np.where(full, width, first_zero), lens):
        return None
    plane = jnp.asarray(cp.astype(np.uint8))
    lens_d = jnp.asarray(lens)
    if len(_PLANE_CACHE) >= _PLANE_CACHE_MAX:
        _PLANE_CACHE.pop(next(iter(_PLANE_CACHE)))
    _PLANE_CACHE[key] = (dvals, plane, lens_d)
    return plane, lens_d


def split_plain_pattern(pattern: str, ci: bool) -> Optional[List[bytes]]:
    """LIKE pattern → literal segments, or None if not plain (has ``_``,
    escapes, or non-ASCII). Segments are the ``%``-separated pieces; empty
    first/last segments encode unanchored prefix/suffix."""
    if "_" in pattern or "\\" in pattern:
        return None
    try:
        raw = pattern.encode("ascii")
    except UnicodeEncodeError:
        return None
    if ci:
        raw = raw.lower()
    return [s for s in raw.split(b"%")]


def device_like_lut(dvals: np.ndarray, pattern: str, ci: bool) -> Optional[np.ndarray]:
    """Boolean LUT over dict values for a plain LIKE pattern, computed on
    device. None → caller must use the host path."""
    segs = split_plain_pattern(pattern, ci)
    if segs is None:
        return None
    ck = (id(dvals), pattern, ci)
    hit = _LIKE_LUT_CACHE.get(ck)
    if hit is not None and hit[0] is dvals:
        return hit[1]
    packed = _pack_dict(dvals)
    if packed is None:
        return None
    plane, lens = packed
    if ci:
        # ASCII lowercase: fold A-Z
        is_up = jnp.logical_and(plane >= 65, plane <= 90)
        plane = jnp.where(is_up, plane + 32, plane)
    n, L = plane.shape
    anchored_prefix = segs[0] != b""
    anchored_suffix = len(segs) > 1 and segs[-1] != b""
    mids = [s for s in (segs[1:-1] if len(segs) > 1 else []) if s]
    ok = jnp.ones((n,), jnp.bool_)
    pos = jnp.zeros((n,), jnp.int32)

    def find_from(seg: bytes, pos, anchored: bool):
        m = len(seg)
        if m > L:
            return jnp.zeros((n,), jnp.bool_), pos
        w = L - m + 1
        acc = jnp.ones((n, w), jnp.bool_)
        for k, b in enumerate(seg):
            acc = jnp.logical_and(acc, plane[:, k:k + w] == np.uint8(b))
        j = jnp.arange(w, dtype=jnp.int32)[None, :]
        valid = jnp.logical_and(acc, j <= (lens - m)[:, None])
        if anchored:
            found = valid[:, 0]
            return found, jnp.full((n,), m, jnp.int32)
        valid = jnp.logical_and(valid, j >= pos[:, None])
        found = jnp.any(valid, axis=1)
        first = jnp.argmax(valid, axis=1).astype(jnp.int32)
        return found, first + m

    if anchored_prefix:
        f, pos = find_from(segs[0], pos, anchored=True)
        ok = jnp.logical_and(ok, f)
    if len(segs) == 1:
        # no % at all: exact match
        ok = jnp.logical_and(ok, lens == len(segs[0]))
    else:
        for seg in mids:
            f, pos = find_from(seg, pos, anchored=False)
            ok = jnp.logical_and(ok, f)
        if anchored_suffix:
            sfx = segs[-1]
            m = len(sfx)
            start = lens - m
            ok = jnp.logical_and(ok, start >= pos)
            idx = jnp.clip(start[:, None]
                           + jnp.arange(m, dtype=jnp.int32)[None, :], 0, L - 1)
            got = jnp.take_along_axis(plane, idx, axis=1)
            ok = jnp.logical_and(
                ok, jnp.all(got == jnp.asarray(np.frombuffer(sfx, np.uint8)),
                            axis=1))
    lut = np.asarray(ok)
    if len(_LIKE_LUT_CACHE) >= _LIKE_LUT_CACHE_MAX:
        _LIKE_LUT_CACHE.pop(next(iter(_LIKE_LUT_CACHE)))
    _LIKE_LUT_CACHE[ck] = (dvals, lut)
    return lut
