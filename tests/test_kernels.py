"""Unit tests for the core TPU kernels (hash, group, join, sort, compact)."""

import numpy as np
import jax.numpy as jnp

from duckdb_tpu.ops import hash as h
from duckdb_tpu.ops import aggregate as agg
from duckdb_tpu.ops import join as j
from duckdb_tpu.ops import sort as s
from duckdb_tpu.ops import compact as c


def test_hash64_distinct():
    x = jnp.arange(1000, dtype=jnp.int64)
    hv = np.asarray(h.hash64(x))
    assert len(np.unique(hv)) == 1000


def test_perfect_group_ids():
    k1 = jnp.array([0, 1, 0, 1, 2, 0], dtype=jnp.int32)
    k2 = jnp.array([1, 1, 0, 0, 1, 1], dtype=jnp.int32)
    live = jnp.array([True, True, True, True, True, False])
    gid, n = agg.perfect_group_ids([k1, k2], [3, 2], live)
    assert n == 6
    np.testing.assert_array_equal(np.asarray(gid), [1, 3, 0, 2, 5, 6])


def test_sort_group_ids_and_segment_sum():
    keys = jnp.array([5, 3, 5, 3, 9, 0, 0, 0], dtype=jnp.int64)
    live = jnp.array([True] * 5 + [False] * 3)
    vals = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 100.0, 100.0, 100.0])
    perm, gid_sorted, ng = agg.sort_group_ids([keys], live)
    assert int(ng) == 3
    sums = agg.segment_sum(vals[perm], gid_sorted, num_segments=9, sorted_ids=True)
    # groups sorted by key: 3 → 6.0, 5 → 4.0, 9 → 5.0
    np.testing.assert_allclose(np.asarray(sums)[:3], [6.0, 4.0, 5.0])
    # trash group (dead rows) must not pollute real groups
    keys_sorted = keys[perm]
    assert int(keys_sorted[0]) == 3


def test_sorted_join_inner_expansion():
    # build: keys [10, 20, 20, 30], probe: [20, 99, 10, 20]
    bkeys = jnp.array([10, 20, 20, 30, 0], dtype=jnp.int64)
    blive = jnp.array([True, True, True, True, False])
    table = j.build_sorted(bkeys, blive)
    pkeys = jnp.array([20, 99, 10, 20], dtype=jnp.int64)
    plive = jnp.array([True, True, True, True])
    counts, lo, hi = j.probe_counts(table, pkeys, plive)
    np.testing.assert_array_equal(np.asarray(counts), [2, 0, 1, 2])
    total = int(np.asarray(counts).sum())
    prow, brow, olive = j.expand_matches(counts, lo, table.perm, total=8)
    prow, brow, olive = np.asarray(prow), np.asarray(brow), np.asarray(olive)
    assert olive.sum() == total == 5
    pairs = sorted(zip(prow[olive].tolist(), np.asarray(bkeys)[brow[olive]].tolist()))
    assert pairs == [(0, 20), (0, 20), (2, 10), (3, 20), (3, 20)]


def test_sorted_join_left_outer():
    bkeys = jnp.array([10, 20], dtype=jnp.int64)
    blive = jnp.array([True, True])
    table = j.build_sorted(bkeys, blive)
    pkeys = jnp.array([20, 99], dtype=jnp.int64)
    plive = jnp.array([True, True])
    counts, lo, hi = j.probe_counts(table, pkeys, plive)
    prow, brow, olive = j.expand_matches(counts, lo, table.perm, total=4, left_outer=True)
    prow, brow, olive = np.asarray(prow), np.asarray(brow), np.asarray(olive)
    assert olive.sum() == 2
    got = dict(zip(prow[olive].tolist(), brow[olive].tolist()))
    assert got[1] == -1  # unmatched probe row survives with NULL build side
    assert np.asarray(bkeys)[got[0]] == 20


def test_perfect_join():
    bkeys = jnp.array([100, 101, 103], dtype=jnp.int64)
    blive = jnp.array([True, True, True])
    slots = j.perfect_build(bkeys, blive, 100, 103)
    rows, matched = j.perfect_probe(
        slots, jnp.array([101, 102, 103, 99], dtype=jnp.int64), jnp.array([True] * 4), 100
    )
    np.testing.assert_array_equal(np.asarray(matched), [True, False, True, False])
    assert int(rows[0]) == 1 and int(rows[2]) == 2


def test_sort_permutation_desc_nulls():
    data = jnp.array([3.0, 1.0, 2.0, 7.0], dtype=jnp.float64)
    valid = jnp.array([True, True, False, True])
    live = jnp.array([True, True, True, True])
    k = s.orderable_int64(data, valid, descending=True, nulls_first=False)
    perm = np.asarray(s.sort_permutation([k], live))
    # DESC, NULLS LAST: 7.0, 3.0, 1.0, NULL
    np.testing.assert_array_equal(perm, [3, 0, 1, 2])


def test_orderable_floats_negative():
    data = jnp.array([-1.5, -2.5, 0.0, 2.5], dtype=jnp.float64)
    k = s.orderable_int64(data, None, descending=False, nulls_first=False)
    perm = np.asarray(s.sort_permutation([k], jnp.ones(4, bool)))
    np.testing.assert_array_equal(perm, [1, 0, 2, 3])


def test_compact_indices():
    mask = jnp.array([False, True, True, False, True])
    idx, live = c.compact_indices(mask, out_size=4)
    np.testing.assert_array_equal(np.asarray(idx)[:3], [1, 2, 4])
    np.testing.assert_array_equal(np.asarray(live), [True, True, True, False])
