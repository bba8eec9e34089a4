"""Built-in default macros + list_aggregate.

Reference: src/catalog/default/default_functions.cpp internal_macros[],
core_functions/scalar/list/list_aggregates.cpp. Values differential-
checked against the reference binary (see test_vs_reference).
"""

import subprocess

import os
import pytest

import duckdb_tpu

from tests._refbin import REF_BIN as REF  # noqa: E501


@pytest.fixture
def con():
    return duckdb_tpu.connect()


def test_user_macros(con):
    assert con.sql("SELECT current_user(), session_user()").rows() == \
        [("duckdb", "duckdb")]


def test_round_even(con):
    assert con.sql("SELECT round_even(2.5, 0), round_even(3.5, 0)").rows() \
        == [(2.0, 4.0)]
    assert con.sql("SELECT roundbankers(4.5, 0)").rows() == [(4.0,)]


def test_fdiv_fmod(con):
    assert con.sql("SELECT fdiv(7, 2), fmod(7.5, 2)").rows() == [(3.0, 1.5)]


def test_list_mutators(con):
    assert con.sql("SELECT list_append([1,2], 3)").rows() == [([1, 2, 3],)]
    assert con.sql("SELECT list_prepend(0, [1,2])").rows() == [([0, 1, 2],)]
    assert con.sql("SELECT array_pop_back([1,2,3])").rows() == [([1, 2],)]
    assert con.sql("SELECT array_pop_front([1,2,3])").rows() == [([2, 3],)]
    assert con.sql("SELECT list_reverse([1,2,3])").rows() == [([3, 2, 1],)]


def test_list_aggregate(con):
    rows = con.sql(
        "SELECT list_sum([1,2,3]), list_min([3,1,2]), list_max([3,1,2]), "
        "list_count([1,NULL,2]), list_avg([1.0,2.0,4.0])").rows()
    assert rows == [(6, 1, 3, 2, 7.0 / 3)]
    assert con.sql("SELECT list_aggr(['a','b'], 'string_agg', '-')").rows() \
        == [("a-b",)]
    assert con.sql("SELECT list_bool_and([true, false])").rows() == [(False,)]
    assert con.sql("SELECT list_median([1,2,3,4])").rows() == [(2.5,)]
    # empty/NULL-only lists -> NULL (count -> 0)
    assert con.sql("SELECT list_sum([]), list_count([])").rows() == \
        [(None, 0)]
    with pytest.raises(Exception, match="unsupported aggregate"):
        con.sql("SELECT list_aggr([1], 'nope')")


def test_array_to_string(con):
    assert con.sql("SELECT array_to_string([1,2,3], '|')").rows() == \
        [("1|2|3",)]


def test_aggregate_macros(con):
    con.sql("CREATE TABLE w (v DOUBLE, wt DOUBLE)")
    con.sql("INSERT INTO w VALUES (1, 2), (3, 1), (NULL, 5)")
    rows = con.sql("SELECT wavg(v, wt) FROM w").rows()
    assert abs(rows[0][0] - 5.0 / 3) < 1e-12
    rows = con.sql("SELECT geomean(v) FROM w").rows()
    assert abs(rows[0][0] - 3 ** 0.5) < 1e-12


def test_date_macros(con):
    assert con.sql("SELECT days_in_month(DATE '2024-02-10')").rows() == \
        [(29,)]


def test_user_macro_overrides_default(con):
    con.sql("CREATE OR REPLACE MACRO fdiv(x, y) AS 42")
    assert con.sql("SELECT fdiv(7, 2)").rows() == [(42,)]


@pytest.mark.skipif(not os.path.exists(REF), reason="no reference binary")
def test_vs_reference(con):
    sql = ("SELECT round_even(2.5,0), fmod(7.5,2), list_sum([1,2,3]), "
           "array_to_string([1,2,3],'-'), days_in_month(DATE '2024-02-10'), "
           "list_stddev_samp([1.0,2.0,3.0]), list_median([1,2,3,4]), "
           "list_skewness([1.0,2.0,4.0,8.0]), list_entropy([1,1,2])")
    ref = subprocess.run([REF, "-list", "-noheader", "-c", sql],
                         capture_output=True, text=True)
    ours = con.sql(sql).rows()[0]

    def fmt(v):
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    refs = [f"{float(p):.6g}" if p.replace(".", "").replace("-", "")
            .isdigit() and "." in p else p
            for p in ref.stdout.strip().split("|")]
    assert refs == [fmt(v) for v in ours]
