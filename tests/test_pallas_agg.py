"""Pallas limb-matmul grouped-sum kernel: exactness + engine integration.

The kernel (ops/pallas_agg.py) computes int64 grouped sums on the MXU
via exact bf16 8-bit limbs — the hand-tuned replacement for the
x64-emulated masked reduce on TPU (reference's tightest loop:
src/execution/aggregate_hashtable.cpp AddChunk). On CPU it runs in
Pallas interpreter mode; these tests pin its exactness (negatives,
carries, dead rows, many slots) and that the engine produces identical
results with the kernel forced on.
"""

import numpy as np
import pytest

import duckdb_tpu
from duckdb_tpu.ops import pallas_agg


@pytest.mark.parametrize("n,k,nseg", [
    (5000, 3, 7),        # mixed signs
    (100, 1, 1),         # single slot, tiny
    (70000, 2, 9),       # crosses many tiles
    (2048, 4, 256),      # max domain
])
def test_kernel_exact(n, k, nseg):
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    dense = rng.integers(0, nseg + 1, n)   # nseg = dead slot
    vecs = []
    for _ in range(k):
        v = rng.integers(-2**55, 2**55, n)
        v[dense == nseg] = 0
        vecs.append(v)
    out = pallas_agg.grouped_sum_i64(
        jnp.asarray(dense), [jnp.asarray(v) for v in vecs], nseg)
    for j in range(k):
        want = np.array([vecs[j][dense == g].sum() for g in range(nseg)])
        assert (np.asarray(out[j]) == want).all()


def test_engine_integration_q1_shape():
    """Same GROUP BY results with the kernel forced on vs off."""
    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (g VARCHAR, d DECIMAL(12,2), i BIGINT)")
    rows = []
    rng = np.random.default_rng(7)
    for i in range(2000):
        g = "ABC"[int(rng.integers(0, 3))]
        rows.append(f"('{g}', {rng.integers(-10**9, 10**9) / 100}, "
                    f"{rng.integers(-2**40, 2**40)})")
    con.sql("INSERT INTO t VALUES " + ",".join(rows))
    q = ("SELECT g, sum(d), sum(i), count(*), avg(d) FROM t "
         "GROUP BY g ORDER BY g")
    con.sql("SET pallas_grouped_sum = 'off'")
    want = con.sql(q).rows()
    con.sql("SET pallas_grouped_sum = 'on'")
    got = con.sql(q).rows()
    con.sql("RESET pallas_grouped_sum")
    assert got == want
    assert len(got) == 3
