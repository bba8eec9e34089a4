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


def test_exchange_join_left_and_semi(data_dir):
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
