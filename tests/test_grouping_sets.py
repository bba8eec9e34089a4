"""GROUPING SETS / ROLLUP / CUBE and the SAMPLE clause.

Expectations differentially verified against the reference binary
(reference: src/execution/operator/aggregate/physical_hash_aggregate.cpp
multi-set grouping; src/parser/transform/helpers/transform_sample.cpp).
"""

import pytest


@pytest.fixture(scope="module")
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE t (g INT, s VARCHAR, v INT)")
    c.sql("INSERT INTO t VALUES (1,'a',10),(1,'b',20),(2,'a',5),(2,'b',9),"
          "(3,'a',7),(1,'a',NULL)")
    return c


def test_rollup_single(con):
    rows = con.sql("SELECT g, sum(v) FROM t GROUP BY ROLLUP(g) "
                   "ORDER BY 1 NULLS LAST, 2").rows()
    assert rows == [(1, 30), (2, 14), (3, 7), (None, 51)]


def test_rollup_two_keys(con):
    rows = con.sql("SELECT g, s, sum(v), count(*) FROM t GROUP BY "
                   "ROLLUP(g, s) ORDER BY 1 NULLS LAST, 2 NULLS LAST, 3"
                   ).rows()
    assert rows == [(1, 'a', 10, 2), (1, 'b', 20, 1), (1, None, 30, 3),
                    (2, 'a', 5, 1), (2, 'b', 9, 1), (2, None, 14, 2),
                    (3, 'a', 7, 1), (3, None, 7, 1), (None, None, 51, 6)]


def test_cube(con):
    rows = con.sql("SELECT g, s, sum(v) FROM t GROUP BY CUBE(g, s) "
                   "ORDER BY 1 NULLS LAST, 2 NULLS LAST, 3").rows()
    assert len(rows) == 11  # 5 present (g,s) pairs + 3 (g) + 2 (s) + 1 ()
    assert rows[-1] == (None, None, 51)
    assert (None, 'a', 22) in rows and (None, 'b', 29) in rows


def test_grouping_sets_explicit(con):
    rows = con.sql("SELECT s, g, avg(v) FROM t GROUP BY GROUPING SETS "
                   "((s), (g)) ORDER BY 1 NULLS LAST, 2 NULLS LAST").rows()
    assert rows == [('a', None, 22 / 3), ('b', None, 14.5),
                    (None, 1, 15.0), (None, 2, 7.0), (None, 3, 7.0)]


def test_grouping_function(con):
    rows = con.sql("SELECT g, s, GROUPING(g), GROUPING(s), GROUPING(g, s) "
                   "FROM t GROUP BY CUBE(g, s) "
                   "ORDER BY 3, 4, 1 NULLS LAST, 2 NULLS LAST").rows()
    assert rows[0][2:] == (0, 0, 0)
    assert rows[-1][2:] == (1, 1, 3)


def test_mixed_plain_and_rollup(con):
    rows = con.sql("SELECT g, s, min(v) FROM t GROUP BY g, ROLLUP(s) "
                   "ORDER BY 1, 2 NULLS LAST").rows()
    assert (1, None, 10) in rows and (2, None, 5) in rows


def test_having_applies_per_set(con):
    rows = con.sql("SELECT g, sum(v) FROM t GROUP BY ROLLUP(g) "
                   "HAVING sum(v) > 10 ORDER BY 1 NULLS LAST").rows()
    assert rows == [(1, 30), (2, 14), (None, 51)]


def test_empty_grouping_set(con):
    assert con.sql("SELECT sum(v) FROM t GROUP BY GROUPING SETS (())"
                   ).rows() == [(51,)]


class TestSample:
    @pytest.fixture(scope="class")
    def scon(self):
        import duckdb_tpu

        c = duckdb_tpu.connect()
        c.sql("CREATE TABLE big AS SELECT range AS a FROM range(1000)")
        return c

    def test_rows_sample_exact_count(self, scon):
        assert scon.sql("SELECT count(*) FROM (SELECT * FROM big "
                        "USING SAMPLE 100)").rows() == [(100,)]

    def test_percent_sample_approximate(self, scon):
        n = scon.sql("SELECT count(*) FROM (SELECT * FROM big "
                     "USING SAMPLE 10%)").rows()[0][0]
        assert 40 <= n <= 200

    def test_seeded_sample_repeatable(self, scon):
        q = ("SELECT sum(a) FROM (SELECT * FROM big USING SAMPLE "
             "10 PERCENT (bernoulli, 42))")
        assert scon.sql(q).rows() == scon.sql(q).rows()

    def test_method_first_form(self, scon):
        assert scon.sql("SELECT count(*) FROM (SELECT * FROM big "
                        "USING SAMPLE reservoir(50 ROWS))").rows() == [(50,)]

    def test_sample_after_where_clamps(self, scon):
        assert scon.sql("SELECT count(*) FROM (SELECT * FROM big "
                        "WHERE a < 100 USING SAMPLE 500)").rows() == [(100,)]

    def test_sampled_rows_come_from_table(self, scon):
        rows = scon.sql("SELECT min(a) >= 0 AND max(a) < 1000 FROM "
                        "(SELECT * FROM big USING SAMPLE 50)").rows()
        assert rows == [(True,)]


class TestTableSample:
    def test_tablesample_pre_join(self):
        import duckdb_tpu

        c = duckdb_tpu.connect()
        c.sql("CREATE TABLE t AS SELECT range AS a FROM range(1000)")
        c.sql("CREATE TABLE u AS SELECT range AS b FROM range(10)")
        assert c.sql("SELECT count(*) FROM t TABLESAMPLE 100"
                     ).rows() == [(100,)]
        # sample applies BEFORE the join (reference: tablesample binds to the
        # table ref), so 20 sampled rows x 10 = 200
        assert c.sql("SELECT count(*) FROM t AS x TABLESAMPLE 20 ROWS, u "
                     "WHERE x.a < 2000").rows() == [(200,)]
        assert c.sql("SELECT count(*) FROM t TABLESAMPLE 50, "
                     "u TABLESAMPLE 3 ROWS").rows() == [(150,)]
