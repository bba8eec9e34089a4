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


def test_sharded_minmax(data_dir):
    sql = ("SELECT l_returnflag, min(l_quantity), max(l_extendedprice), "
           "avg(l_discount) FROM lineitem GROUP BY l_returnflag "
           "ORDER BY l_returnflag")
    single, sharded = _run_both(sql, data_dir)
    assert single == sharded
