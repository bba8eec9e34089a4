"""Distributed execution on a virtual 8-device mesh: results must be
bit-identical to single-chip execution."""

import os
import subprocess

import pytest

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "sf0.01")
QD = "/root/reference/extension/tpch/dbgen/queries"


@pytest.fixture(scope="module")
def data_dir():
    if not os.path.isdir(DATA):
        root = os.path.join(os.path.dirname(__file__), "..")
        subprocess.run(["bash", "tools/tpch_dbgen/build.sh"], cwd=root,
                       check=True)
        subprocess.run(["./build/tpch_dbgen/dbgen_tbl", "0.01", "data/sf0.01"],
                       cwd=root, check=True)
    return DATA


def _run_both(sql, data_dir):
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.load_tpch(data_dir)
    single = con.sql(sql).rows()
    con.sql("SET num_shards = 8")
    con._plan_cache.clear()
    sharded = con.sql(sql).rows()
    return single, sharded


def test_sharded_aggregate_q1(data_dir):
    sql = open(f"{QD}/q01.sql").read()
    single, sharded = _run_both(sql, data_dir)
    assert single == sharded


def test_sharded_join_q3(data_dir):
    sql = open(f"{QD}/q03.sql").read()
    single, sharded = _run_both(sql, data_dir)
    assert single == sharded


def _run_exchange(sql, data_dir, threshold=0):
    """Run single-chip vs 8-shard with the exchange join FORCED (threshold
    0 routes every eligible unique-build join through all_to_all
    repartitioning, not the dense-PK replicated shortcut)."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.load_tpch(data_dir)
    single = con.sql(sql).rows()
    con.sql("SET num_shards = 8")
    con.sql(f"SET exchange_join_threshold = {threshold}")
    con._plan_cache.clear()
    sharded = con.sql(sql).rows()
    logs = con.sql("SELECT count(*) FROM duckdb_logs() "
                   "WHERE type = 'exchange_join' "
                   "AND message LIKE 'join repartitioned%'").rows()[0][0]
    return single, sharded, logs


def test_exchange_join_q3(data_dir):
    single, sharded, n_exchanged = _run_exchange(
        open(f"{QD}/q03.sql").read(), data_dir)
    assert single == sharded
    assert n_exchanged >= 1  # the path actually ran, not a silent fallback


def test_exchange_join_q9(data_dir):
    single, sharded, n_exchanged = _run_exchange(
        open(f"{QD}/q09.sql").read(), data_dir)
    assert single == sharded
    assert n_exchanged >= 1


def test_exchange_join_left_and_semi(data_dir, monkeypatch):
    # pin the EXCHANGE path: the fused aggregate pipeline now covers
    # semi/anti probes and would otherwise pre-empt the exchange join
    from duckdb_tpu.execution import fused_agg as FA
    monkeypatch.setattr(FA, "build_fused_agg", lambda ex, node: None)
    for sql in [
        "SELECT count(*), sum(o_totalprice) FROM orders "
        "LEFT JOIN customer ON o_custkey = c_custkey",
        "SELECT count(*) FROM orders WHERE EXISTS "
        "(SELECT 1 FROM customer WHERE c_custkey = o_custkey)",
        "SELECT count(*) FROM orders WHERE o_custkey NOT IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 0)",
    ]:
        single, sharded, n_exchanged = _run_exchange(sql, data_dir)
        assert single == sharded, sql
        assert n_exchanged >= 1, sql


def test_sharded_minmax(data_dir):
    sql = ("SELECT l_returnflag, min(l_quantity), max(l_extendedprice), "
           "avg(l_discount) FROM lineitem GROUP BY l_returnflag "
           "ORDER BY l_returnflag")
    single, sharded = _run_both(sql, data_dir)
    assert single == sharded


def test_exchange_join_duplicate_build_keys(data_dir):
    """Dup-key exchange join (fact-fact shape): 8-shard must match
    single-chip bit-exactly, and the dup path must actually run."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE l (k INT, v INT)")
    con.sql("INSERT INTO l SELECT range % 50, range FROM range(4000)")
    con.sql("CREATE TABLE r (k INT, w INT)")
    con.sql("INSERT INTO r SELECT range % 50, range * 3 FROM range(300)")
    # median defeats the fused-aggregate path (which would replicate the
    # build instead) so the general join path + exchange runs
    q = ("SELECT l.k, median(l.v + r.w), count(*) FROM l JOIN r ON l.k = r.k "
         "GROUP BY l.k ORDER BY l.k")
    single = con.sql(q).rows()
    con.sql("SET num_shards = 8")
    con.sql("SET exchange_join_threshold = 0")
    con._plan_cache.clear()
    sharded = con.sql(q).rows()
    assert single == sharded
    n_ex = con.sql("SELECT count(*) FROM duckdb_logs() WHERE "
                   "type = 'exchange_join' AND message LIKE "
                   "'dup-key join repartitioned%'").rows()[0][0]
    assert n_ex >= 1, "dup-key exchange path did not run"


def test_exchange_join_dup_semi_anti(data_dir):
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE l (k INT, v INT)")
    con.sql("INSERT INTO l SELECT range % 37, range FROM range(3000)")
    con.sql("CREATE TABLE r (k INT)")
    con.sql("INSERT INTO r SELECT range % 11 FROM range(200)")
    for q in (
        "SELECT count(*) FROM l WHERE EXISTS "
        "(SELECT 1 FROM r WHERE r.k = l.k)",
        "SELECT count(*) FROM l WHERE NOT EXISTS "
        "(SELECT 1 FROM r WHERE r.k = l.k)",
    ):
        single = con.sql(q).rows()
        con.sql("SET num_shards = 8")
        con.sql("SET exchange_join_threshold = 0")
        con._plan_cache.clear()
        sharded = con.sql(q).rows()
        con.sql("SET num_shards = 1")
        con._plan_cache.clear()
        assert single == sharded, q


def test_sharded_order_by(data_dir):
    """Distributed ORDER BY: sample-range partition + local sorts must
    reproduce the single-chip ordering bit-exactly."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a BIGINT, b INT)")
    con.sql("INSERT INTO t SELECT (range * 2654435761) % 1000000, range "
            "FROM range(20000)")
    q = "SELECT a FROM t ORDER BY a"
    single = con.sql(q).rows()
    con.sql("SET num_shards = 8")
    con._plan_cache.clear()
    sharded = con.sql(q).rows()
    assert single == sharded
    n_s = con.sql("SELECT count(*) FROM duckdb_logs() WHERE "
                  "type = 'sharded_sort' AND message LIKE "
                  "'ORDER BY range-partitioned%'").rows()[0][0]
    assert n_s >= 1, "sharded sort path did not run"


def test_sharded_order_by_desc_nulls(data_dir):
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a BIGINT)")
    con.sql("INSERT INTO t SELECT CASE WHEN range % 97 = 0 THEN NULL "
            "ELSE (range * 48271) % 99991 END FROM range(17000)")
    for q in ("SELECT a FROM t ORDER BY a DESC",
              "SELECT a FROM t ORDER BY a NULLS FIRST"):
        single = con.sql(q).rows()
        con.sql("SET num_shards = 8")
        con._plan_cache.clear()
        sharded = con.sql(q).rows()
        con.sql("SET num_shards = 1")
        con._plan_cache.clear()
        assert single == sharded, q


def test_skew_growth_exchange_join():
    """Hash-skewed keys overflow the uniform send buckets; the executor
    must grow capacities to the kernel's pmax'd demand and retry on the
    mesh (MaybeRepartition analog) instead of falling back single-chip."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE dim (k BIGINT PRIMARY KEY, name VARCHAR)")
    con.sql("INSERT INTO dim SELECT range, 'n' || CAST(range AS VARCHAR) "
            "FROM range(4096)")
    # 85% of fact rows share ONE key -> one chip owns most of the probe side
    con.sql("CREATE TABLE fact (k BIGINT, v BIGINT)")
    con.sql("INSERT INTO fact SELECT CASE WHEN range % 20 < 17 THEN 7 "
            "ELSE range % 4096 END, range FROM range(40000)")
    q = ("SELECT count(*), sum(f.v), min(d.name) FROM fact f "
         "JOIN dim d ON f.k = d.k")
    single = con.sql(q).rows()
    con.sql("SET num_shards = 8")
    con.sql("SET exchange_join_threshold = 0")
    con._plan_cache.clear()
    sharded = con.sql(q).rows()
    assert single == sharded
    logs = con.sql("SELECT message FROM duckdb_logs() "
                   "WHERE type = 'exchange_join'").fetchall()
    msgs = [m for (m,) in logs]
    assert any("skew: growing caps" in m or "exchange skew" in m
               for m in msgs), msgs
    assert any(m.startswith("join repartitioned")
               or m.startswith("dup-key join repartitioned")
               for m in msgs), msgs


def test_skew_growth_sharded_sort_kernel():
    """Kernel-level: an undersized range-bucket capacity overflows; the
    demand counter reports the exact pmax'd bucket fill, and rerunning at
    that capacity yields the exact global multi-key order. (At the SQL
    layer the initial cap is 2x the local shard size, which per-chip
    send demand can never exceed — the growth path guards learned caps
    that went stale across queries.)"""
    import numpy as np
    import jax.numpy as jnp
    from duckdb_tpu.parallel.shard import get_sharded_sort

    rng = np.random.default_rng(7)
    r = 4096
    k0 = np.where(rng.random(r) < 0.9, 5,
                  rng.integers(0, 50, r)).astype(np.int64)
    k1 = rng.integers(0, 10, r).astype(np.int64)
    keys = jnp.stack([jnp.asarray(k0), jnp.asarray(k1)])
    live = jnp.ones(r, bool)
    rows = jnp.arange(r, dtype=jnp.int32)
    _, _, ovf, need = get_sharded_sort(8, 64, nkeys=2)(keys, live, rows)
    assert int(ovf) > 0 and int(need) > 64
    out_rows, out_live, ovf2, _ = get_sharded_sort(8, int(need), nkeys=2)(
        keys, live, rows)
    assert int(ovf2) == 0
    sel = np.asarray(out_rows)[np.asarray(out_live)]
    tup = list(zip(k0[sel], k1[sel], sel))
    assert tup == sorted(tup), "not in global stable order"


def test_auto_shard_policy():
    """num_shards = 0 (the default) distributes automatically once the
    working set exceeds auto_shard_rows — no SET required."""
    import duckdb_tpu

    con = duckdb_tpu.connect()
    assert con.sql("SELECT value FROM duckdb_settings() "
                   "WHERE name = 'num_shards'").rows()[0][0] in (0, "0")
    con.sql("CREATE TABLE big (g BIGINT, v BIGINT)")
    con.sql("INSERT INTO big SELECT range % 11, range FROM range(40000)")
    rows = con.sql("SELECT g, sum(v) FROM big GROUP BY g ORDER BY g").rows()
    assert rows == [(g, sum(range(g, 40000, 11))) for g in range(11)]
    # small tables stay single-chip (below auto_shard_rows)
    con.sql("CREATE TABLE small AS SELECT range AS r FROM range(100)")
    assert con.sql("SELECT sum(r) FROM small").rows()[0][0] == 4950


def test_sharded_window_vs_single(monkeypatch):
    """Hash-partition exchange window (hashed_sort.cpp strategy) vs the
    single-chip oracle, across ranking + default-frame aggregates."""
    import duckdb_tpu
    from duckdb_tpu.execution import window_exec as WX

    setup = ["CREATE TABLE w (g INT, o INT, v INT, f DOUBLE)",
             "INSERT INTO w SELECT range % 97, (range * 31) % 1009, "
             "range % 50, range / 3.0 FROM range(40000)"]
    queries = [
        "SELECT g, o, row_number() OVER (PARTITION BY g ORDER BY o) rn "
        "FROM w ORDER BY g, o LIMIT 5",
        "SELECT g, o, rank() OVER (PARTITION BY g ORDER BY v) rn FROM w "
        "ORDER BY g, o LIMIT 5",
        "SELECT g, dense_rank() OVER (PARTITION BY g ORDER BY v) FROM w "
        "ORDER BY g, o LIMIT 5",
        "SELECT g, sum(v) OVER (PARTITION BY g) s FROM w ORDER BY g "
        "LIMIT 3",
        "SELECT g, sum(v) OVER (PARTITION BY g ORDER BY o) s FROM w "
        "ORDER BY g, o LIMIT 5",
        "SELECT g, avg(f) OVER (PARTITION BY g) s FROM w ORDER BY g "
        "LIMIT 3",
        "SELECT g, min(v) OVER (PARTITION BY g) s FROM w ORDER BY g "
        "LIMIT 3",
    ]
    con = duckdb_tpu.connect()
    for s in setup:
        con.sql(s)
    single = [con.sql(q).rows() for q in queries]
    con2 = duckdb_tpu.connect()
    for s in setup:
        con2.sql(s)
    con2.sql("SET num_shards = 8")
    for q, exp in zip(queries, single):
        assert con2.sql(q).rows() == exp, q
    n = con2.sql("SELECT count(*) FROM duckdb_logs() "
                 "WHERE type = 'sharded_window'").rows()[0][0]
    assert n >= len(queries), "sharded window path did not engage"


def test_sharded_topn_vs_single():
    """Per-shard top-k + candidate gather-merge (physical_top_n analog)."""
    import duckdb_tpu

    setup = ["CREATE TABLE t (a INT, s VARCHAR)",
             "INSERT INTO t SELECT (range * 7919) % 100000, "
             "'v' || (range % 4) FROM range(65536)"]
    queries = ["SELECT a FROM t ORDER BY a LIMIT 7",
               "SELECT a FROM t ORDER BY a DESC LIMIT 5 OFFSET 3",
               "SELECT a, s FROM t ORDER BY s, a LIMIT 6",
               "SELECT a FROM t WHERE a > 50000 ORDER BY a LIMIT 4"]
    con = duckdb_tpu.connect()
    for s in setup:
        con.sql(s)
    single = [con.sql(q).rows() for q in queries]
    con2 = duckdb_tpu.connect()
    for s in setup:
        con2.sql(s)
    con2.sql("SET num_shards = 8")
    for q, exp in zip(queries, single):
        assert con2.sql(q).rows() == exp, q
    n = con2.sql("SELECT count(*) FROM duckdb_logs() "
                 "WHERE type = 'sharded_topn'").rows()[0][0]
    assert n >= 1, "sharded TopN path did not engage"
