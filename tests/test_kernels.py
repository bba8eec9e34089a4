"""Unit tests for the core TPU kernels (hash, group, join, sort, compact)."""

import numpy as np
import jax.numpy as jnp

from duckdb_tpu.ops import hash as h
from duckdb_tpu.ops import join as j
from duckdb_tpu.ops import sort as s
from duckdb_tpu.ops import compact as c


def test_hash64_distinct():
    x = jnp.arange(1000, dtype=jnp.int64)
    hv = np.asarray(h.hash64(x))
    assert len(np.unique(hv)) == 1000


def test_grouped_reduce_masked_and_scatter():
    """grouped_reduce must agree across its masked-bcast and scatter paths,
    including the int64 limb decomposition (exact, wrap-compatible)."""
    from duckdb_tpu.ops import grouped as g

    rng = np.random.default_rng(7)
    n = 5000
    gid = jnp.asarray(rng.integers(0, 300, n).astype(np.int32))
    vi = jnp.asarray(rng.integers(-(10**17), 10**17, n))
    vf = jnp.asarray(rng.standard_normal(n))
    for nseg in (300, 64):  # 300 → scatter path, 64 → masked path
        d = jnp.where(gid < nseg, gid, nseg)
        res = g.grouped_reduce(d, [vi, vf, vi], ["sum", "sum", "max"], nseg)
        gi, gf, mi = (np.asarray(r) for r in res)
        gid_np = np.asarray(d)
        for s_ in (0, 1, nseg - 1):
            sel = gid_np == s_
            assert gi[s_] == np.asarray(vi)[sel].sum(), (nseg, s_)
            np.testing.assert_allclose(gf[s_], np.asarray(vf)[sel].sum(),
                                       rtol=1e-12)
            assert mi[s_] == np.asarray(vi)[sel].max()


def test_seg_sum_int64_limbs_exact():
    """_seg_sum's 22-bit-limb f64 route must match int64 exactly, including
    negative values and large magnitudes."""
    from duckdb_tpu.execution.aggregate_exec import _seg_sum

    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.integers(-(2**62), 2**62, 4096) // 3)
    ids = jnp.asarray(rng.integers(0, 17, 4096).astype(np.int32))
    got = np.asarray(_seg_sum(data, ids, 17))
    dn, idn = np.asarray(data), np.asarray(ids)
    for s_ in range(17):
        assert got[s_] == dn[idn == s_].sum(), s_


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
