"""SQL parser tests over TPC-H-style queries and general SQL shapes."""

import pytest

from duckdb_tpu.sql import parse_sql
from duckdb_tpu.sql import nodes as N


def one(sql):
    stmts = parse_sql(sql)
    assert len(stmts) == 1
    return stmts[0]


def test_simple_select():
    s = one("SELECT 1 + 2 AS x, 'abc' y")
    assert isinstance(s, N.SelectStatement)
    (e1, a1), (e2, a2) = s.node.select_list
    assert a1 == "x" and a2 == "y"
    assert isinstance(e1, N.BinaryOp) and e1.op == "+"


def test_tpch_q1_shape():
    sql = """
    select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty,
        sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
        avg(l_discount) as avg_disc, count(*) as count_order
    from lineitem
    where l_shipdate <= date '1998-12-01' - interval '90' day
    group by l_returnflag, l_linestatus
    order by l_returnflag, l_linestatus;
    """
    s = one(sql)
    n = s.node
    assert len(n.select_list) == 6
    assert isinstance(n.from_table, N.BaseTableRef) and n.from_table.name == "lineitem"
    assert isinstance(n.where, N.BinaryOp) and n.where.op == "<="
    assert isinstance(n.where.right, N.BinaryOp) and isinstance(
        n.where.right.right, N.IntervalLiteral
    )
    assert len(n.group_by) == 2 and len(s.order_by) == 2
    agg = n.select_list[5][0]
    assert isinstance(agg, N.FunctionCall) and agg.is_star


def test_joins_and_subquery():
    sql = """
    select o.o_orderkey from orders o
    join customer c on o.o_custkey = c.c_custkey
    left join nation on c.c_nationkey = n_nationkey
    where exists (select 1 from lineitem where l_orderkey = o.o_orderkey)
      and c.c_acctbal > (select avg(c_acctbal) from customer)
    """
    s = one(sql)
    jr = s.node.from_table
    assert isinstance(jr, N.JoinRef) and jr.join_type == "left"
    assert isinstance(jr.left, N.JoinRef) and jr.left.join_type == "inner"
    w = s.node.where
    assert isinstance(w, N.Conjunction) and isinstance(w.children[0], N.Exists)


def test_case_in_between_like():
    sql = """
    select case when x in (1,2,3) then 'a' when y between 1 and 2 then 'b'
                else 'c' end
    from t where name like '%green%' and name not like 'x%'
    """
    s = one(sql)
    e = s.node.select_list[0][0]
    assert isinstance(e, N.CaseExpr) and len(e.whens) == 2
    w = s.node.where
    assert isinstance(w.children[0], N.LikeExpr)
    assert w.children[1].negated


def test_cte_union_setops():
    sql = """
    with r as (select 1 a), s as (select 2 a)
    select * from r union all select a from s order by 1 limit 5 offset 2
    """
    s = one(sql)
    assert len(s.ctes) == 2
    assert isinstance(s.node, N.SetOpNode) and s.node.all
    assert s.limit is not None and s.offset is not None


def test_cast_forms():
    s = one("select cast(x as decimal(12,2)), y::double, try_cast('z' as int)")
    c1, c2, c3 = (e for e, _ in s.node.select_list)
    assert c1.type_name == "decimal" and c1.type_mods == (12, 2)
    assert c2.type_name == "double"
    assert c3.try_cast


def test_window_function():
    s = one(
        "select rank() over (partition by g order by v desc), "
        "sum(v) over (order by v rows between unbounded preceding and current row) from t"
    )
    w1 = s.node.select_list[0][0]
    assert isinstance(w1, N.WindowFunction)
    assert len(w1.spec.partition_by) == 1
    w2 = s.node.select_list[1][0]
    assert w2.spec.frame[0] == "rows"


def test_ddl_dml():
    ct = one("create table t (a integer primary key, b varchar, c decimal(10,2) not null)")
    assert isinstance(ct, N.CreateTable) and len(ct.columns) == 3
    assert ct.columns[0].primary_key and ct.columns[2].not_null
    ins = one("insert into t values (1, 'x', 3.5), (2, 'y', 4.5)")
    assert isinstance(ins, N.InsertStatement)
    assert isinstance(ins.source.node, N.ValuesNode)
    upd = one("update t set b = 'z' where a = 1")
    assert isinstance(upd, N.UpdateStatement)
    dele = one("delete from t where a = 2")
    assert isinstance(dele, N.DeleteStatement)
    drp = one("drop table if exists t")
    assert drp.if_exists


def test_tpch_q2_correlated():
    sql = """
    select s_acctbal, s_name from part, supplier, partsupp, nation, region
    where p_partkey = ps_partkey and s_suppkey = ps_suppkey and p_size = 15
      and p_type like '%BRASS' and s_nationkey = n_nationkey
      and n_regionkey = r_regionkey and r_name = 'EUROPE'
      and ps_supplycost = (
        select min(ps_supplycost) from partsupp, supplier, nation, region
        where p_partkey = ps_partkey and s_suppkey = ps_suppkey
          and s_nationkey = n_nationkey and n_regionkey = r_regionkey
          and r_name = 'EUROPE')
    order by s_acctbal desc, s_name limit 100
    """
    s = one(sql)
    assert s.limit is not None
    # from-list is a left-deep cross-join chain
    fr = s.node.from_table
    depth = 0
    while isinstance(fr, N.JoinRef):
        depth += 1
        fr = fr.left
    assert depth == 4


def test_extract_substring():
    s = one("select extract(year from o_orderdate), substring(c_phone from 1 for 2), substring(x, 2, 3) from t")
    e1, e2, e3 = (e for e, _ in s.node.select_list)
    assert isinstance(e1, N.ExtractExpr) and e1.field == "year"
    assert isinstance(e2, N.FunctionCall) and len(e2.args) == 3
    assert len(e3.args) == 3


def test_distinct_count_filter():
    s = one("select count(distinct a), sum(b) filter (where c > 0) from t group by all")
    c1, c2 = (e for e, _ in s.node.select_list)
    assert c1.distinct
    assert c2.filter is not None
    assert s.node.group_by_all
