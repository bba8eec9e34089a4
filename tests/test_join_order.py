"""DP join-order optimizer: plan shapes + greedy-equivalence.

Reference analog: /root/reference/src/optimizer/join_order/ (query graph
DP with cardinality estimation) and its regression coverage under
test/sql/optimizer/joins/. Q3/Q5/Q9-class star joins must come out with
the fact table as the probe spine and filtered dimensions pre-joined
(bushy), and every query must return identical rows under SET
join_order='greedy' and 'dp'.
"""

import os
import subprocess

import pytest

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "sf0.01")
QD = "/root/reference/extension/tpch/dbgen/queries"


@pytest.fixture(scope="module")
def con():
    import duckdb_tpu

    if not os.path.isdir(DATA):
        root = os.path.join(os.path.dirname(__file__), "..")
        subprocess.run(["bash", "tools/tpch_dbgen/build.sh"], cwd=root,
                       check=True)
        subprocess.run(["./build/tpch_dbgen/dbgen_tbl", "0.01", "data/sf0.01"],
                       cwd=root, check=True)
    c = duckdb_tpu.connect()
    c.load_tpch(DATA)
    return c


def _explain(con, sql):
    return con.sql("EXPLAIN " + sql).rows()[0][0]


def test_q3_bushy_dimension_prejoin(con):
    """Q3: customer⋈orders must join before the fact probe (the DP's
    bushy win over a left-deep lineitem spine)."""
    plan = _explain(con, open(f"{QD}/q03.sql").read())
    li = plan.index("Scan lineitem")
    orders = plan.index("Scan orders")
    cust = plan.index("Scan customer")
    # lineitem is the probe side of the OUTERMOST join: it appears before
    # both dimension scans, which sit together under the inner join
    assert li < orders < cust


@pytest.mark.parametrize("q", ["q05", "q07", "q09", "q10"])
def test_fact_table_is_probe_spine(con, q):
    """Unfiltered-fact star queries: the fact relation must head the join
    tree (probe side), never sit on a build side at fact scale. (Q8 is
    excluded deliberately: its part filter crushes lineitem⋈part to ~400
    rows, and the DP correctly demotes it below orders.)"""
    plan = _explain(con, open(f"{QD}/{q}.sql").read())
    li = plan.index("Scan lineitem")
    for dim in ("Scan nation", "Scan region", "Scan supplier"):
        if dim in plan:
            assert li < plan.index(dim), f"{q}: {dim} precedes lineitem"


@pytest.mark.parametrize("q", ["q02", "q03", "q05", "q07", "q08", "q09",
                               "q10", "q11", "q18", "q21"])
def test_dp_matches_greedy_results(con, q):
    sql = open(f"{QD}/{q}.sql").read()
    con.sql("SET join_order = 'greedy'")
    con._plan_cache.clear()
    want = con.sql(sql).rows()
    con.sql("SET join_order = 'dp'")
    con._plan_cache.clear()
    got = con.sql(sql).rows()
    con.sql("RESET join_order")
    assert got == want


def test_q9_faster_class_shape(con):
    """Q9 (5-way join, the round-2 perf cliff): part filter must place
    part as a build under the lineitem probe spine, and supplier/nation
    must not appear above lineitem."""
    plan = _explain(con, open(f"{QD}/q09.sql").read())
    li = plan.index("Scan lineitem")
    assert li < plan.index("Scan partsupp")
    assert li < plan.index("Scan nation")
