"""LIST / STRUCT nested types.

TPU representation: dict-encoded object columns (int32 codes on device,
distinct tuples host-side), so nested scalar functions are LUT gathers.
Value expectations differentially verified against the reference binary
(reference: src/core_functions/scalar/list/*.cpp,
src/execution/operator/projection/physical_unnest.cpp).
"""

import pytest


@pytest.fixture(scope="module")
def con():
    import duckdb_tpu

    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE t (g INT, s VARCHAR, v INT)")
    c.sql("INSERT INTO t VALUES (1,'a,b',10),(1,'c',20),(2,'d,e,f',5),"
          "(2,'g',NULL),(3,NULL,7)")
    return c


def test_list_literal(con):
    assert con.sql("SELECT [1, 2, 3]").rows() == [([1, 2, 3],)]
    assert con.sql("SELECT ['x', 'y']").rows() == [(["x", "y"],)]


def test_list_index(con):
    # 1-based; negative from end; out of range / index 0 → NULL
    assert con.sql("SELECT [1,2,3][2], [1,2,3][-1], [1,2,3][9], [1,2,3][0]"
                   ).rows() == [(2, 3, None, None)]


def test_list_len_contains(con):
    assert con.sql("SELECT len([1,2,3]), list_contains([1,2,3], 2), "
                   "list_contains([1,2,3], 9)").rows() == [(3, True, False)]


def test_string_split(con):
    assert con.sql("SELECT string_split('a,b,c', ',')"
                   ).rows() == [(["a", "b", "c"],)]
    rows = con.sql("SELECT s, string_split(s, ',') FROM t WHERE g = 2 "
                   "ORDER BY s").rows()
    assert rows == [("d,e,f", ["d", "e", "f"]), ("g", ["g"])]


def test_list_sort_distinct(con):
    rows = con.sql("SELECT list_sort([3,1,2]), list_reverse_sort([1,3,2]), "
                   "sorted_d: list_sort(list_distinct([1,1,2,2]))").rows() \
        if False else con.sql(
        "SELECT list_sort([3,1,2]), list_reverse_sort([1,3,2]), "
        "list_sort(list_distinct([1,1,2,2]))").rows()
    assert rows == [([1, 2, 3], [3, 2, 1], [1, 2])]


def test_list_aggregate(con):
    # the reference keeps NULL elements in list() (list.cpp)
    rows = con.sql("SELECT g, list(v) FROM t GROUP BY g ORDER BY g").rows()
    assert rows == [(1, [10, 20]), (2, [5, None]), (3, [7])]
    assert con.sql("SELECT list(v) FROM t WHERE v > 100"
                   ).rows() == [(None,)]


def test_array_agg_strings(con):
    rows = con.sql("SELECT g, array_agg(s) FROM t GROUP BY g ORDER BY g"
                   ).rows()
    assert rows == [(1, ["a,b", "c"]), (2, ["d,e,f", "g"]), (3, [None])]


def test_unnest(con):
    assert con.sql("SELECT unnest([1,2,3])").rows() == [(1,), (2,), (3,)]
    # NULL list unnests to zero rows; sibling columns replicate
    rows = con.sql("SELECT g, unnest(string_split(s, ',')) FROM t "
                   "ORDER BY 1, 2").rows()
    assert rows == [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (2, "e"),
                    (2, "f"), (2, "g")]


def test_struct_literal_and_extract(con):
    assert con.sql("SELECT {'a': 1, 'b': 'x'}"
                   ).rows() == [({"a": 1, "b": "x"},)]
    assert con.sql("SELECT {'a': 1, 'b': 'x'}['b'], "
                   "struct_extract({'a': 42}, 'a')").rows() == [("x", 42)]


def test_list_of_lists(con):
    assert con.sql("SELECT [[1,2],[3]][1]").rows() == [([1, 2],)]


def test_unnest_then_aggregate(con):
    rows = con.sql(
        "SELECT part, count(*) FROM (SELECT unnest(string_split(s, ',')) "
        "AS part FROM t) GROUP BY part ORDER BY part").rows()
    assert len(rows) == 7 and rows[0] == ("a", 1)


def test_columnar_list_value(con):
    """list_value over column refs (eager ListPack node)."""
    con.sql("CREATE TABLE lp (a INT, b INT)")
    con.sql("INSERT INTO lp VALUES (1,2),(3,NULL)")
    assert con.sql("SELECT list_value(a, b) FROM lp ORDER BY a"
                   ).rows() == [([1, 2],), ([3, None],)]
    assert con.sql("SELECT len(list_value(a, b, 9)) FROM lp ORDER BY a"
                   ).rows() == [(3,), (3,)]
    assert con.sql("SELECT unnest(list_value(a, b)) FROM lp ORDER BY 1"
                   ).rows() == [(1,), (2,), (3,), (None,)]
    assert con.sql("SELECT list_sort(list_value(b, a, 7)) FROM lp "
                   "ORDER BY a").rows() == [([1, 2, 7],), ([3, 7, None],)]


def test_lambda_transform_filter(con):
    """list_transform / list_filter with x -> expr lambdas (evaluated once
    per distinct element; reference: list_transform.cpp lambda executor)."""
    assert con.sql("SELECT list_transform([1,2,3], x -> x + 1)"
                   ).rows() == [([2, 3, 4],)]
    # current reference syntax (single-arrow is deprecated there)
    assert con.sql("SELECT list_transform([1,2,3], lambda x: x + 1)"
                   ).rows() == [([2, 3, 4],)]
    assert con.sql("SELECT list_filter([1,2,3,4], x -> x % 2 = 0)"
                   ).rows() == [([2, 4],)]
    # NULL elements map through transform, drop through filter
    assert con.sql("SELECT list_transform([1,2,NULL], x -> x + 1)"
                   ).rows() == [([2, 3, None],)]
    assert con.sql("SELECT list_filter([1,NULL,3], x -> x > 1)"
                   ).rows() == [([3],)]


def test_lambda_over_column_lists(con):
    rows = con.sql("SELECT list_transform(string_split(s, ','), "
                   "x -> upper(x)) FROM t WHERE g = 2 ORDER BY s").rows()
    assert rows == [(["D", "E", "F"],), (["G"],)]
    rows = con.sql("SELECT list_filter(string_split(s, ','), "
                   "x -> len(x) >= 1) FROM t WHERE g = 1 ORDER BY s").rows()
    assert rows == [(["a", "b"],), (["c"],)]


def test_ddl_list_columns(tmp_path):
    """CREATE TABLE with INT[]/VARCHAR[] columns, INSERT of list literals,
    and checkpoint/reopen round trip (codes + JSON dictionary files)."""
    import duckdb_tpu

    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE lt (id INT, tags VARCHAR[], nums INT[])")
    c.sql("INSERT INTO lt VALUES (1, ['a','b'], [10,20,30]), "
          "(2, ['c'], []), (3, NULL, [5])")
    assert c.sql("SELECT * FROM lt ORDER BY id").rows() == [
        (1, ["a", "b"], [10, 20, 30]), (2, ["c"], []), (3, None, [5])]
    assert c.sql("SELECT id, len(nums), nums[1] FROM lt ORDER BY id"
                 ).rows() == [(1, 3, 10), (2, 0, None), (3, 1, 5)]
    assert c.sql("SELECT id FROM lt WHERE list_contains(nums, 20)"
                 ).rows() == [(1,)]

    db = str(tmp_path / "listdb")
    c2 = duckdb_tpu.connect(db)
    c2.sql("CREATE TABLE p (id INT, v INT[])")
    c2.sql("INSERT INTO p VALUES (1, [1,2]), (2, [3])")
    c2.close()
    c3 = duckdb_tpu.connect(db)
    assert c3.sql("SELECT * FROM p ORDER BY id").rows() == [
        (1, [1, 2]), (2, [3])]
    c3.sql("INSERT INTO p VALUES (3, [9])")
    assert c3.sql("SELECT id, len(v) FROM p ORDER BY id").rows() == [
        (1, 2), (2, 1), (3, 1)]


def test_list_surface_functions(con):
    """Concatenation, append/prepend, slicing, flatten, position — all
    reference-verified (list || list, 1-based inclusive slices)."""
    assert con.sql("SELECT [1,2] || [3], list_concat([1],[2],[3])"
                   ).rows() == [([1, 2, 3], [1, 2, 3])]
    assert con.sql("SELECT list_append([1,2], 3), list_prepend(0, [1,2])"
                   ).rows() == [([1, 2, 3], [0, 1, 2])]
    assert con.sql("SELECT [1,2,3,4][2:3], list_slice([1,2,3,4,5], 2, 4)"
                   ).rows() == [([2, 3], [2, 3, 4])]
    assert con.sql("SELECT flatten([[1,2],[3]])").rows() == [([1, 2, 3],)]
    assert con.sql("SELECT list_position([4,5,6], 5), "
                   "list_position([4,5,6], 9)").rows() == [(2, None)]


def test_indexed_lambda(con):
    assert con.sql("SELECT list_transform(['a','b'], lambda x, i: i)"
                   ).rows() == [([1, 2],)]
    assert con.sql("SELECT list_filter([10,20,30], lambda x, i: i >= 2)"
                   ).rows() == [([20, 30],)]


def test_struct_ddl_columns(tmp_path):
    """STRUCT(a INT, b VARCHAR) columns: DDL, struct-literal INSERT,
    extraction, filtering, and typed persistence (tagged JSON dict)."""
    import decimal
    import duckdb_tpu

    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE st (id INT, s STRUCT(a INT, b VARCHAR))")
    c.sql("INSERT INTO st VALUES (1, {'a': 10, 'b': 'x'}), "
          "(2, {'a': 20, 'b': 'y'}), (3, NULL)")
    assert c.sql("SELECT id, s['a'], struct_extract(s, 'b') FROM st "
                 "ORDER BY id").rows() == [(1, 10, "x"), (2, 20, "y"),
                                           (3, None, None)]
    assert c.sql("SELECT id FROM st WHERE s['a'] = 20").rows() == [(2,)]

    db = str(tmp_path / "structdb")
    c2 = duckdb_tpu.connect(db)
    c2.sql("CREATE TABLE sp (s STRUCT(x INT, y DECIMAL(4,1)))")
    c2.sql("INSERT INTO sp VALUES ({'x': 1, 'y': 2.5})")
    c2.close()
    c3 = duckdb_tpu.connect(db)
    assert c3.sql("SELECT s['y'] FROM sp").rows() == [
        (decimal.Decimal("2.5"),)]


def test_distinct_list_agg(con):
    # reference keeps one NULL in list(DISTINCT); element order unspecified
    rows = con.sql("SELECT list(DISTINCT x) FROM "
                   "(SELECT unnest([1,1,2,NULL,2]) AS x)").rows()
    assert sorted(rows[0][0], key=lambda v: (v is None, v)) == [1, 2, None]


def test_keyword_pseudo_columns(con):
    assert con.sql("SELECT current_date = today()").rows() == [(True,)]
    assert con.sql("SELECT current_timestamp > "
                   "TIMESTAMP '2020-01-01 00:00:00'").rows() == [(True,)]


def test_map_type(con):
    """MAP literals, element access (NULL on absent key), keys/values,
    cardinality, map() constructor (reference: map functions family)."""
    assert con.sql("SELECT MAP {'a': 1, 'b': 2}"
                   ).rows() == [({"a": 1, "b": 2},)]
    assert con.sql("SELECT MAP {'a': 1}['a'], MAP {'a': 1}['z']"
                   ).rows() == [(1, None)]
    assert con.sql("SELECT map_keys(MAP {'a': 1, 'b': 2}), "
                   "map_values(MAP {'a': 1, 'b': 2})"
                   ).rows() == [(["a", "b"], [1, 2])]
    assert con.sql("SELECT cardinality(MAP {'a':1,'b':2}), "
                   "map_contains(MAP {'a':1}, 'a'), "
                   "map_contains(MAP {'a':1}, 'z')"
                   ).rows() == [(2, True, False)]
    assert con.sql("SELECT map(['k1','k2'],[10,20])"
                   ).rows() == [({"k1": 10, "k2": 20},)]
    assert con.sql("SELECT MAP {1: 'x', 2: 'y'}[2]").rows() == [("y",)]


def test_histogram_aggregate(con):
    assert con.sql("SELECT histogram(x) FROM "
                   "(SELECT unnest([1,2,2,3,3,3]) AS x)"
                   ).rows() == [({1: 1, 2: 2, 3: 3},)]
    con.sql("CREATE TABLE hh (g INT, v VARCHAR)")
    con.sql("INSERT INTO hh VALUES (1,'a'),(1,'a'),(1,'b'),(2,'c')")
    assert con.sql("SELECT g, histogram(v) FROM hh GROUP BY g ORDER BY g"
                   ).rows() == [(1, {"a": 2, "b": 1}), (2, {"c": 1})]


def test_multi_unnest_zip(con):
    """Multiple unnests zip by position; shorter lists NULL-pad."""
    assert con.sql("SELECT unnest([1,2,3]) AS a, unnest(['x','y']) AS b"
                   ).rows() == [(1, "x"), (2, "y"), (3, None)]
