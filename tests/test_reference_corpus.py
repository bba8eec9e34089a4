"""Run reference sqllogictest files UNMODIFIED from the reference tree.

The curated list below fully passes through this engine's runner (the
same format the reference's own harness uses, test/sqlite/). The list
grows as coverage widens; any regression on these is a hard failure.
"""

import os

import pytest

REF_TESTS = "/root/reference/test/sql"

CURATED = [
    "filter/filter_cache.test",
    "filter/test_constant_comparisons.test",
    "filter/test_zonemap_segment.test",
    "conjunction/or_between.test",
    "conjunction/or_comparison.test",
    "limit/test_preserve_insertion_order.test",
    "aggregate/aggregates/test_empty_aggregate.test",
    "join/inner/empty_tinyint_column.test",
    "join/inner/join_cross_product.test",
    "join/inner/not_between_is_null.test",
    "join/inner/test_eq_ineq_join.test",
    "join/inner/test_inner_join_filter_pushdown.test",
    "join/inner/test_lt_join.test",
    "join/inner/test_unequal_join.test",
    "subquery/scalar/test_correlated_subquery_cte.test",
    "window/test_tpcds_q49.test",
    "window/test_window_binding.test",
    "window/window_mtcars.test",
    "cte/cte_on_conflict_issue.test",
    "function/string/like_unicode.test",
    "function/string/regex_filter_pushdown.test",
    "function/string/test_issue_1812.test",
    "projection/test_table_star.test",
    "filter/test_transitive_filters.test",
    "cte/test_issue_5673.test",
]


@pytest.mark.skipif(not os.path.isdir(REF_TESTS),
                    reason="reference tree not mounted")
@pytest.mark.parametrize("rel", CURATED)
def test_reference_file(rel):
    from duckdb_tpu.testing.sqllogic import SqlLogicRunner

    res = SqlLogicRunner().run_file(os.path.join(REF_TESTS, rel))
    assert res.ok, "\n".join(res.errors)
    assert res.passed >= 3
