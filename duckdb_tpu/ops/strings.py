"""Device-side string execution over packed dictionary byte planes.

The engine's VARCHAR columns are int32 codes into a per-column dictionary
(host side). String work used to run as a PYTHON loop over distinct values
(fine for low-cardinality columns, a multi-second host stall for
near-unique ones: lineitem.l_comment has ~4.5M distinct values at SF1).

This module packs a dictionary once into a device byte plane
``[n_distinct, max_len] uint8`` (+ lengths) and evaluates string work
vectorized on the VPU:

- **LIKE / ILIKE**, full surface: ``%`` multi-wildcards, ``_``
  single-char wildcards, ``\\``-escapes — tokenized into %-separated
  segments of byte-or-any tokens and matched with greedy leftmost
  shifted-window comparisons (complete because segments are fixed
  length). Only non-ASCII patterns/dictionaries fall back to the host
  regex loop.
- **Transforms** (upper/lower/substring/left/right/reverse/trim/pad/
  concat-with-constants/...): plane → plane ops; the result plane is
  decoded ONCE with vectorized numpy (fixed-width bytes view + C-speed
  unique) — never one Python call per distinct value.
- **Predicates / int functions** (contains/prefix/suffix/strpos/length/
  ascii): plane → bool/int LUT gathered by code.

Reference analog: string_t + the scalar string function family
(/root/reference/src/include/duckdb/common/types/string_type.hpp:28-30,
src/function/scalar/string/) — re-shaped columnar: one plane op per
function instead of one function call per row.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# dictionary plane cache: id(dict_values) → (weak sentinel, plane, lens)
_PLANE_CACHE: dict = {}
_PLANE_CACHE_MAX = 8

# pre-packed byte matrices registered at ingest (load_string_dict already
# has the fixed-width bytes — skips the slow UTF-32 repack of millions of
# Python strings): id(dict_values) → (sentinel, u8 matrix, lens)
_PREPACKED: dict = {}
_PREPACKED_MAX = 8


def register_plane(dvals: np.ndarray, fixed_bytes: np.ndarray,
                   lens: np.ndarray):
    """Attach the raw fixed-width byte matrix for a dictionary so
    _pack_dict can skip re-deriving it from Python strings."""
    mat = np.ascontiguousarray(fixed_bytes).view(np.uint8).reshape(
        len(dvals), -1)
    _cache_put(_PREPACKED, _PREPACKED_MAX, id(dvals),
               (dvals, mat, np.asarray(lens, np.int32)))


def _lut_device():
    """Device for dictionary-LUT programs. On the tunneled 'axon' runtime
    a dictionary plane upload rides a slow RPC link (measured ~17 MB/s —
    minutes for an SF10 comment column, HTTP 413 above the request cap),
    so per-dictionary constants compute on the local CPU backend; the
    per-ROW code gathers stay on the TPU. On a directly-attached TPU
    (backend 'tpu') host→HBM is ~10s of GB/s and the plane lives in HBM."""
    try:
        if jax.default_backend() == "axon":
            return jax.devices("cpu")[0]
    except Exception:
        pass
    return None

# (id(dict_values), op_key) → result LUT (bool/int np arrays, or
# (remap codes, uniq values) for transforms)
_LUT_CACHE: dict = {}
_LUT_CACHE_MAX = 64

# (op key, plane width) → jitted plane program. Plane ops ALWAYS run as
# jitted programs with the plane as an argument: the tunneled runtime
# rejects multi-MB inline constants (HTTP 413) and charges ~30 ms per
# eager dispatch, so one program per op is both required and fastest.
_JIT_CACHE: dict = {}
_JIT_CACHE_MAX = 128

# below this cardinality the host loop is cheap and avoids device work
DEVICE_LIKE_MIN_DICT = 4096
DEVICE_STR_MIN_DICT = 4096

# observability: per-distinct host loops over large dictionaries are the
# exact pathology the device path exists to kill; record every occurrence
# so tests (and `duckdb_logs()`, when a connection attaches its manager)
# can assert the device path actually ran. [(fn_name, n_distinct), ...]
host_loop_events: List[Tuple[str, int]] = []

# the executing query's LogManager (set by Executor.run from its catalog,
# NOT a most-recent-connection global: warnings land in the session that
# actually ran the host loop, and closed connections' managers aren't
# kept alive)
import contextvars as _contextvars

ACTIVE_LOG: "_contextvars.ContextVar" = _contextvars.ContextVar(
    "duckdb_tpu_active_log", default=None)


def note_host_loop(fn_name: str, n_distinct: int):
    """Record a per-distinct host loop (only noteworthy when large)."""
    if n_distinct >= DEVICE_STR_MIN_DICT:
        host_loop_events.append((fn_name, n_distinct))
        log = ACTIVE_LOG.get()
        if log is not None:
            log.warn("StringHostLoop",
                     f"{fn_name} over {n_distinct} distinct values "
                     "ran on host (device plane unavailable)")


def _cache_put(cache, maxlen, key, value):
    if len(cache) >= maxlen:
        cache.pop(next(iter(cache)))
    cache[key] = value


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
    pre = _PREPACKED.get(key)
    if pre is not None and pre[0] is dvals:
        mat, lens = pre[1], pre[2]
        if mat.size and int(mat.max()) > 127:
            return None  # non-ASCII: host regex path (same rule as below)
    else:
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
        # reject embedded NULs: length = position of the first 0
        first_zero = np.argmax(cp == 0, axis=1)
        full = (cp != 0).all(axis=1)
        if not np.array_equal(np.where(full, width, first_zero), lens):
            return None
        mat = cp.astype(np.uint8)
    # the plane is a per-dictionary constant: upload it OUTSIDE any active
    # jit trace (device_put is a primitive — inside a trace it would yield
    # a Tracer, poisoning the cache for later queries)
    import contextlib

    dev = _lut_device()
    ctx = jax.default_device(dev) if dev is not None \
        else contextlib.nullcontext()
    with jax.ensure_compile_time_eval(), ctx:
        plane = jnp.asarray(mat)
        lens_d = jnp.asarray(lens)
    _cache_put(_PLANE_CACHE, _PLANE_CACHE_MAX, key, (dvals, plane, lens_d))
    return plane, lens_d


# ---------------------------------------------------------------------------
# LIKE pattern tokenization + matching

def tokenize_pattern(pattern: str, ci: bool) -> Optional[List[List[Optional[int]]]]:
    """LIKE pattern → %-separated segments of tokens; a token is a literal
    byte value or None (= ``_``, any single char). ``\\`` escapes the next
    char. Returns None for non-ASCII patterns (host regex fallback)."""
    segs: List[List[Optional[int]]] = [[]]
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            i += 1
            lit = pattern[i]
            o = ord(lit.lower() if ci else lit)
            if o > 127:
                return None
            segs[-1].append(o)
        elif ch == "%":
            segs.append([])
        elif ch == "_":
            segs[-1].append(None)
        else:
            o = ord(ch.lower() if ci else ch)
            if o > 127:
                return None
            segs[-1].append(o)
        i += 1
    return segs


def split_plain_pattern(pattern: str, ci: bool) -> Optional[List[bytes]]:
    """LIKE pattern → literal byte segments, or None if it has ``_``,
    escapes, or non-ASCII (those still run on device via
    tokenize_pattern; this stricter form exists for fused-path callers
    that want pure literals)."""
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
    """Boolean LUT over dict values for a LIKE pattern, computed on
    device. Handles %, _, and escapes; None → caller must use the host
    path (non-ASCII pattern or dictionary)."""
    segs = tokenize_pattern(pattern, ci)
    if segs is None:
        return None
    ck = (id(dvals), "like", pattern, ci)
    hit = _LUT_CACHE.get(ck)
    if hit is not None and hit[0] is dvals:
        return hit[1]
    packed = _pack_dict(dvals)
    if packed is None:
        return None
    # One jitted program per (pattern, ci, plane width): the plane rides as
    # a jit ARGUMENT (data channel — the tunneled runtime rejects multi-MB
    # inline constants with HTTP 413, and one program beats ~30 ms/op eager
    # dispatch). ensure_compile_time_eval keeps this legal when the caller
    # is itself being traced (fused aggregate programs).
    segs_key = tuple(tuple(s) for s in segs)
    jk = ("like", segs_key, ci, packed[0].shape[1])
    jfn = _JIT_CACHE.get(jk)
    if jfn is None:
        jfn = jax.jit(lambda plane, lens: _like_match(plane, lens, segs, ci))
        _cache_put(_JIT_CACHE, _JIT_CACHE_MAX, jk, jfn)
    with jax.ensure_compile_time_eval():
        lut = np.asarray(jfn(*packed))
    _cache_put(_LUT_CACHE, _LUT_CACHE_MAX, ck, (dvals, lut))
    return lut


def _like_match(plane, lens, segs, ci):
    if ci:
        # ASCII lowercase: fold A-Z
        is_up = jnp.logical_and(plane >= 65, plane <= 90)
        plane = jnp.where(is_up, plane + 32, plane)
    n, L = plane.shape
    anchored_prefix = len(segs[0]) > 0
    anchored_suffix = len(segs) > 1 and len(segs[-1]) > 0
    mids = [s for s in (segs[1:-1] if len(segs) > 1 else []) if s]
    # masks derive from the (possibly traced) inputs, NEVER jnp.ones/zeros
    # of (n, ...) shapes: under ensure_compile_time_eval those materialize
    # as 100MB literal constants inside the program, which the tunneled
    # compile service rejects with HTTP 413 (measured on TPC-H Q13's
    # o_comment LIKE: three (1.39M, 72) bool constants)
    ok = lens == lens
    pos = lens * 0

    def find_from(seg: List[Optional[int]], pos, anchored: bool):
        m = len(seg)
        if m > L:
            return lens < 0, pos
        w = L - m + 1
        acc = None
        for k, b in enumerate(seg):
            if b is None:  # '_' matches any char (length checked below)
                continue
            eqk = plane[:, k:k + w] == np.uint8(b)
            acc = eqk if acc is None else jnp.logical_and(acc, eqk)
        if acc is None:  # all-wildcard segment: every window matches
            win = plane[:, 0:w]
            acc = win == win
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
        # no % at all: exact (wildcard-aware) match
        ok = jnp.logical_and(ok, lens == len(segs[0]))
    else:
        for seg in mids:
            f, pos = find_from(seg, pos, anchored=False)
            ok = jnp.logical_and(ok, f)
        if anchored_suffix:
            sfx = segs[-1]
            m = len(sfx)
            if m > L:
                ok = lens < 0
            else:
                start = lens - m
                ok = jnp.logical_and(ok, start >= pos)
                idx = jnp.clip(start[:, None]
                               + jnp.arange(m, dtype=jnp.int32)[None, :],
                               0, L - 1)
                got = jnp.take_along_axis(plane, idx, axis=1)
                lit = np.array([b if b is not None else 0 for b in sfx],
                               np.uint8)
                anych = np.array([b is None for b in sfx])
                eq = jnp.logical_or(got == jnp.asarray(lit),
                                    jnp.asarray(anych)[None, :])
                ok = jnp.logical_and(ok, jnp.all(eq, axis=1))
    return ok


# ---------------------------------------------------------------------------
# plane transforms: (plane [n,L] u8, lens [n] i32) → (plane', lens')
# All guarantee zero bytes beyond lens' (decode relies on it).

def _mask_tail(plane, lens):
    j = jnp.arange(plane.shape[1], dtype=jnp.int32)[None, :]
    return jnp.where(j < lens[:, None], plane, 0).astype(jnp.uint8)


def op_case(plane, lens, upper: bool):
    if upper:
        hit = jnp.logical_and(plane >= 97, plane <= 122)
        return jnp.where(hit, plane - 32, plane).astype(jnp.uint8), lens
    hit = jnp.logical_and(plane >= 65, plane <= 90)
    return jnp.where(hit, plane + 32, plane).astype(jnp.uint8), lens


def op_initcap(plane, lens):
    low, _ = op_case(plane, lens, upper=False)
    up0, _ = op_case(plane[:, :1], lens, upper=True)
    return jnp.concatenate([up0, low[:, 1:]], axis=1), lens


def op_substring(plane, lens, start0: int, length: Optional[int]):
    """0-based start (callers translate SQL 1-based); start0 >= 0."""
    L = plane.shape[1]
    rem = jnp.maximum(lens - start0, 0)
    new_len = rem if length is None else jnp.minimum(rem, length)
    w = L if length is None else min(length, L)
    w = max(min(w, max(L - start0, 0)), 0)
    if w == 0:
        n = plane.shape[0]
        return jnp.zeros((n, 1), jnp.uint8), jnp.zeros((n,), jnp.int32)
    out = plane[:, start0:start0 + w]
    return _mask_tail(out, new_len), new_len.astype(jnp.int32)


def op_left(plane, lens, k: int):
    if k >= 0:
        return op_substring(plane, lens, 0, k)
    # negative: drop |k| chars from the right
    new_len = jnp.maximum(lens + k, 0)
    return _mask_tail(plane, new_len), new_len.astype(jnp.int32)


def op_right(plane, lens, k: int):
    L = plane.shape[1]
    if k > 0:
        w = min(k, L)
        start = jnp.maximum(lens - k, 0)
        idx = jnp.clip(start[:, None]
                       + jnp.arange(w, dtype=jnp.int32)[None, :], 0, L - 1)
        out = jnp.take_along_axis(plane, idx, axis=1)
        new_len = jnp.minimum(lens, k)
        return _mask_tail(out, new_len), new_len.astype(jnp.int32)
    # k <= 0: drop |k| chars from the left
    return op_substring_dyn(plane, lens, jnp.minimum(-k, lens))


def op_substring_dyn(plane, lens, start):
    """Suffix starting at a per-row dynamic offset."""
    L = plane.shape[1]
    idx = jnp.clip(start[:, None]
                   + jnp.arange(L, dtype=jnp.int32)[None, :], 0, L - 1)
    out = jnp.take_along_axis(plane, idx, axis=1)
    new_len = jnp.maximum(lens - start, 0)
    return _mask_tail(out, new_len), new_len.astype(jnp.int32)


def op_reverse(plane, lens):
    L = plane.shape[1]
    idx = jnp.clip(lens[:, None] - 1
                   - jnp.arange(L, dtype=jnp.int32)[None, :], 0, L - 1)
    out = jnp.take_along_axis(plane, idx, axis=1)
    return _mask_tail(out, lens), lens


def _trim_bounds(plane, lens, chars: bytes):
    j = jnp.arange(plane.shape[1], dtype=jnp.int32)[None, :]
    in_str = j < lens[:, None]
    is_t = jnp.zeros(plane.shape, jnp.bool_)
    for b in chars:
        is_t = jnp.logical_or(is_t, plane == np.uint8(b))
    keep = jnp.logical_and(jnp.logical_not(is_t), in_str)
    any_keep = jnp.any(keep, axis=1)
    first = jnp.where(any_keep, jnp.argmax(keep, axis=1).astype(jnp.int32),
                      lens)
    last1 = jnp.max(jnp.where(keep, j + 1, 0), axis=1).astype(jnp.int32)
    return first, last1  # [first, last1) is the kept span (may be empty)


def op_trim(plane, lens, chars: bytes, left: bool, right: bool):
    first, last1 = _trim_bounds(plane, lens, chars)
    start = first if left else jnp.zeros_like(lens)
    end = last1 if right else lens
    out, _ = op_substring_dyn(plane, jnp.maximum(end, start), start)
    new_len = jnp.maximum(end - start, 0).astype(jnp.int32)
    return _mask_tail(out, new_len), new_len


def op_pad(plane, lens, n: int, pad: str, left: bool):
    """lpad/rpad to exactly n chars, cycling the pad string (duckdb
    semantics: longer inputs truncate to n)."""
    L = plane.shape[1]
    nn = max(n, 1)
    padb = pad.encode("ascii")
    lp = len(padb)
    j = jnp.arange(nn, dtype=jnp.int32)[None, :]
    if lp == 0:  # cannot pad: just truncate
        return op_substring(plane, lens, 0, n)
    pad_arr = jnp.asarray(np.frombuffer(padb, np.uint8))
    if left:
        padlen = jnp.maximum(n - lens, 0)[:, None]
        src = j - padlen
        from_s = src >= 0
        s_val = jnp.take_along_axis(plane, jnp.clip(src, 0, L - 1), axis=1)
        p_val = pad_arr[j[0] % lp][None, :]
        out = jnp.where(from_s, s_val, p_val).astype(jnp.uint8)
    else:
        from_s = j < lens[:, None]
        s_val = plane[:, :nn] if L >= nn else jnp.pad(plane,
                                                      ((0, 0), (0, nn - L)))
        p_idx = jnp.maximum(j - lens[:, None], 0) % lp
        p_val = pad_arr[p_idx]
        out = jnp.where(from_s, s_val[:, :nn], p_val).astype(jnp.uint8)
    new_len = jnp.full_like(lens, n) if n >= 0 else jnp.zeros_like(lens)
    new_len = jnp.where(lens >= n, jnp.minimum(lens, n), new_len)
    return _mask_tail(out, new_len), new_len.astype(jnp.int32)


def op_concat_const(plane, lens, prefix: str, suffix: str):
    """prefix || s || suffix with constant affixes."""
    pb = prefix.encode("ascii")
    sb = suffix.encode("ascii")
    lp, ls = len(pb), len(sb)
    L = plane.shape[1]
    W = lp + L + ls
    j = jnp.arange(W, dtype=jnp.int32)[None, :]
    s_idx = j - lp
    from_s = jnp.logical_and(s_idx >= 0, s_idx < lens[:, None])
    s_val = jnp.take_along_axis(
        jnp.pad(plane, ((0, 0), (0, W - L))) if W > L else plane,
        jnp.clip(s_idx, 0, max(W, L) - 1), axis=1)
    out = s_val
    if lp:
        p_val = jnp.asarray(np.frombuffer(pb, np.uint8))[
            jnp.clip(j[0], 0, lp - 1)][None, :]
        out = jnp.where(j < lp, p_val, out)
    if ls:
        suf_idx = j - lp - lens[:, None]
        sfx = jnp.asarray(np.frombuffer(sb, np.uint8))
        sf_val = sfx[jnp.clip(suf_idx, 0, ls - 1)]
        from_sfx = jnp.logical_and(suf_idx >= 0, suf_idx < ls)
        out = jnp.where(from_sfx, sf_val, out)
    new_len = (lens + (lp + ls)).astype(jnp.int32)
    return _mask_tail(out.astype(jnp.uint8), new_len), new_len


def op_repeat(plane, lens, k: int, max_width: int = 1024):
    L = plane.shape[1]
    W = L * max(k, 0)
    if W == 0:
        n = plane.shape[0]
        return jnp.zeros((n, 1), jnp.uint8), jnp.zeros((n,), jnp.int32)
    if W > max_width:
        raise ValueError("repeat too wide for plane path")
    j = jnp.arange(W, dtype=jnp.int32)[None, :]
    src = j % jnp.maximum(lens, 1)[:, None]
    out = jnp.take_along_axis(
        jnp.pad(plane, ((0, 0), (0, max(W - L, 0)))), src, axis=1)
    new_len = (lens * k).astype(jnp.int32)
    return _mask_tail(out.astype(jnp.uint8), new_len), new_len


# -- plane predicates / int ops ---------------------------------------------

def _find_windows(plane, lens, needle: bytes):
    """bool [n, w]: needle matches starting at each window position."""
    n, L = plane.shape
    m = len(needle)
    if m == 0 or m > L:
        return None
    w = L - m + 1
    acc = jnp.ones((n, w), jnp.bool_)
    for k, b in enumerate(needle):
        acc = jnp.logical_and(acc, plane[:, k:k + w] == np.uint8(b))
    j = jnp.arange(w, dtype=jnp.int32)[None, :]
    return jnp.logical_and(acc, j <= (lens - m)[:, None])


def op_contains(plane, lens, needle: str):
    nb = needle.encode("ascii")
    if len(nb) == 0:
        return jnp.ones((plane.shape[0],), jnp.bool_)
    v = _find_windows(plane, lens, nb)
    if v is None:
        return jnp.zeros((plane.shape[0],), jnp.bool_)
    return jnp.any(v, axis=1)


def op_prefix(plane, lens, pre: str):
    pb = pre.encode("ascii")
    m = len(pb)
    if m == 0:
        return jnp.ones((plane.shape[0],), jnp.bool_)
    if m > plane.shape[1]:
        return jnp.zeros((plane.shape[0],), jnp.bool_)
    ok = lens >= m
    for k, b in enumerate(pb):
        ok = jnp.logical_and(ok, plane[:, k] == np.uint8(b))
    return ok


def op_suffix(plane, lens, sfx: str):
    sb = sfx.encode("ascii")
    m = len(sb)
    L = plane.shape[1]
    if m == 0:
        return jnp.ones((plane.shape[0],), jnp.bool_)
    if m > L:
        return jnp.zeros((plane.shape[0],), jnp.bool_)
    start = lens - m
    idx = jnp.clip(start[:, None]
                   + jnp.arange(m, dtype=jnp.int32)[None, :], 0, L - 1)
    got = jnp.take_along_axis(plane, idx, axis=1)
    eq = jnp.all(got == jnp.asarray(np.frombuffer(sb, np.uint8)), axis=1)
    return jnp.logical_and(eq, start >= 0)


def op_strpos(plane, lens, needle: str):
    """1-based first occurrence; 0 when absent (SQL strpos)."""
    nb = needle.encode("ascii")
    if len(nb) == 0:
        return jnp.ones((plane.shape[0],), jnp.int64)
    v = _find_windows(plane, lens, nb)
    if v is None:
        return jnp.zeros((plane.shape[0],), jnp.int64)
    found = jnp.any(v, axis=1)
    first = jnp.argmax(v, axis=1)
    return jnp.where(found, first + 1, 0).astype(jnp.int64)


def op_ascii(plane, lens):
    return jnp.where(lens > 0, plane[:, 0], 0).astype(jnp.int64)


# ---------------------------------------------------------------------------
# dictionary-level entry points (cached LUTs; None → host fallback)

def _decode_plane(plane2, lens2) -> Tuple[np.ndarray, np.ndarray]:
    """(plane', lens') → (remap int32 codes into uniq, uniq object-of-str).

    One transfer + C-speed bytes unique; only DISTINCT values are decoded
    to Python strings."""
    a = np.asarray(plane2)
    le = np.asarray(lens2)
    n, L = a.shape
    b = np.ascontiguousarray(a).view(f"S{L}").reshape(n)
    uniq_b, inv = np.unique(b, return_inverse=True)
    uniq = np.char.decode(uniq_b, "utf-8").astype(object)
    return inv.astype(np.int32), uniq


def device_transform_lut(dvals: np.ndarray, op_key: str,
                         fn: Callable) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Run a plane transform over the dictionary: → (remap, uniq) or None."""
    ck = (id(dvals), "t", op_key)
    hit = _LUT_CACHE.get(ck)
    if hit is not None and hit[0] is dvals:
        return hit[1], hit[2]
    packed = _pack_dict(dvals)
    if packed is None:
        return None
    jk = ("t", op_key, packed[0].shape[1])
    jfn = _JIT_CACHE.get(jk)
    if jfn is None:
        jfn = jax.jit(fn)
        _cache_put(_JIT_CACHE, _JIT_CACHE_MAX, jk, jfn)
    with jax.ensure_compile_time_eval():  # legal under an outer trace
        try:
            plane2, lens2 = jfn(*packed)
        except ValueError:
            return None
        remap, uniq = _decode_plane(plane2, lens2)
    _cache_put(_LUT_CACHE, _LUT_CACHE_MAX, ck, (dvals, remap, uniq))
    return remap, uniq


def device_value_lut(dvals: np.ndarray, op_key: str,
                     fn: Callable) -> Optional[np.ndarray]:
    """Run a plane predicate/int op over the dictionary: → host LUT."""
    ck = (id(dvals), "v", op_key)
    hit = _LUT_CACHE.get(ck)
    if hit is not None and hit[0] is dvals:
        return hit[1]
    packed = _pack_dict(dvals)
    if packed is None:
        return None
    jk = ("v", op_key, packed[0].shape[1])
    jfn = _JIT_CACHE.get(jk)
    if jfn is None:
        jfn = jax.jit(fn)
        _cache_put(_JIT_CACHE, _JIT_CACHE_MAX, jk, jfn)
    with jax.ensure_compile_time_eval():  # legal under an outer trace
        lut = np.asarray(jfn(*packed))
    _cache_put(_LUT_CACHE, _LUT_CACHE_MAX, ck, (dvals, lut))
    return lut


def device_lens_lut(dvals: np.ndarray) -> Optional[np.ndarray]:
    """Length-in-chars LUT (ASCII planes: chars == bytes)."""
    return device_value_lut(dvals, "len", lambda plane, lens: lens)
