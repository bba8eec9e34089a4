"""Registry of evictable device-memory caches (BufferManager tier 2).

The engine pins device state outside the table-column pool: fused-join
prep caches (LUTs + build column planes), probe-result caches, eager
build batches. Each cache dict registers here; on HBM pressure
(RESOURCE_EXHAUSTED from the backend) `clear_all()` drops every cached
device reference so the allocator can reclaim, and the failed statement
re-runs cold. Reference analog: buffer-pool eviction of hash tables /
intermediates under memory pressure (standard_buffer_manager.cpp).
"""

from __future__ import annotations

import gc
import weakref

_STORES: "weakref.WeakSet[dict]" = weakref.WeakSet()


class _DictHolder:
    pass


def track(store: dict) -> dict:
    """Register a cache dict for pressure eviction; returns it."""
    try:
        _STORES.add(store)
    except TypeError:
        pass  # plain dicts are not weakref-able pre-3.12 patterns; wrap
    return store


class TrackedDict(dict):
    """dict subclass (weakref-able, identity-hashed) for cache stores."""

    __hash__ = object.__hash__


def tracked_dict() -> TrackedDict:
    d = TrackedDict()
    _STORES.add(d)
    return d


def clear_all() -> int:
    """Drop every registered cache entry AND all device-resident table
    columns; returns #stores cleared. Used by the statement-level OOM
    retry: everything re-promotes/re-preps from the host tier."""
    n = 0
    for store in list(_STORES):
        if store:
            store.clear()
            n += 1
    from duckdb_tpu.catalog.catalog import POOL

    POOL.evict_all()
    gc.collect()
    return n


_PRESSURE_BYTES = None
_LAST_STMT_KEY = [None]


def pressure_trim(stmt_key=None) -> bool:
    """Proactive eviction: when a DIFFERENT statement is about to run and
    total live device bytes exceed the pressure threshold, drop all
    caches first. Re-runs of the SAME statement never trim (their caches
    are their own working set — warm runs stay warm). On this runtime an
    actual RESOURCE_EXHAUSTED poisons the backend (freed buffers are not
    reclaimed server-side), so pressure must be relieved ahead of time,
    not recovered from: a large query's peak needs most of HBM free."""
    global _PRESSURE_BYTES
    import jax

    if _PRESSURE_BYTES is None:
        try:
            if jax.devices()[0].platform == "cpu":
                _PRESSURE_BYTES = 0  # host RAM: no trimming
            else:
                _PRESSURE_BYTES = 3 << 30
        except Exception:  # noqa: BLE001
            _PRESSURE_BYTES = 0
    if not _PRESSURE_BYTES:
        return False
    same = stmt_key is not None and stmt_key == _LAST_STMT_KEY[0]
    _LAST_STMT_KEY[0] = stmt_key
    if same:
        return False
    try:
        live = sum(a.nbytes for a in jax.live_arrays())
    except Exception:  # noqa: BLE001
        return False
    if live <= _PRESSURE_BYTES:
        return False
    clear_all()
    return True


def is_oom(err: BaseException) -> bool:
    s = f"{type(err).__name__}: {err}"
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s \
        or "OutOfMemory" in s
