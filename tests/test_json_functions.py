"""Extended JSON function surface.

Reference: extension/json/json_functions/ (json_extract.cpp,
json_create.cpp ToJson, json_merge_patch.cpp RFC 7386, json_contains.cpp,
json_value.cpp, json_structure.cpp, json_strip_nulls.cpp) and the ->/->>
operators. Values match documented duckdb semantics (the local reference
binary is built without the json extension, so these are asserted against
known-good outputs).
"""

import pytest

import duckdb_tpu


@pytest.fixture
def con():
    c = duckdb_tpu.connect()
    c.sql("CREATE TABLE j (d VARCHAR)")
    c.sql("""INSERT INTO j VALUES
        ('{"a": 1, "b": {"c": [1,2,3]}, "s": "x"}'),
        ('{"a": 2, "n": null}'), (NULL)""")
    return c


def test_extract_returns_json(con):
    # json_extract keeps strings quoted; _string unquotes
    assert con.sql("SELECT json_extract(d, '$.s') FROM j").rows() == \
        [('"x"',), (None,), (None,)]
    assert con.sql("SELECT json_extract_string(d, '$.s') FROM j").rows() == \
        [("x",), (None,), (None,)]


def test_arrow_operators(con):
    assert con.sql("SELECT d -> 'a' FROM j").rows() == \
        [("1",), ("2",), (None,)]
    assert con.sql("SELECT d ->> 's' FROM j").rows() == \
        [("x",), (None,), (None,)]
    # chains are left-associative
    assert con.sql("SELECT d -> '$.b.c' -> 1 FROM j").rows() == \
        [("2",), (None,), (None,)]


def test_json_value_scalar_only(con):
    # objects/arrays -> NULL (unlike extract)
    assert con.sql("SELECT json_value(d, '$.b') FROM j").rows() == \
        [(None,), (None,), (None,)]
    assert con.sql("SELECT json_value(d, '$.a') FROM j").rows() == \
        [("1",), ("2",), (None,)]


def test_json_exists(con):
    assert con.sql("SELECT json_exists(d, '$.a') FROM j").rows() == \
        [(True,), (True,), (None,)]


def test_to_json(con):
    rows = con.sql("SELECT to_json([1,2,3]), to_json('str'), to_json(1.5), "
                   "to_json(DATE '2024-01-01'), to_json({'k': 1})").rows()
    assert rows == [("[1,2,3]", '"str"', "1.5", '"2024-01-01"', '{"k":1}')]


def test_json_minify_and_pretty(con):
    assert con.sql("SELECT json('{\"a\":   1}')").rows() == [('{"a":1}',)]
    assert con.sql("SELECT json_pretty('{\"a\":1}')").rows() == \
        [('{\n    "a": 1\n}',)]


def test_json_constructors(con):
    assert con.sql("SELECT json_object('k', 1, 'k2', 'v')").rows() == \
        [('{"k":1,"k2":"v"}',)]
    assert con.sql("SELECT json_array(1, 'a', NULL)").rows() == \
        [('[1,"a",null]',)]


def test_json_merge_patch(con):
    assert con.sql("""SELECT json_merge_patch('{"a":1,"b":2}',
        '{"b":null,"c":3}')""").rows() == [('{"a":1,"c":3}',)]


def test_json_contains(con):
    assert con.sql("SELECT json_contains('{\"a\":[1,2]}', '2')").rows() == \
        [(True,)]
    assert con.sql("SELECT json_contains('{\"a\":[1,2]}', '9')").rows() == \
        [(False,)]


def test_json_strip_nulls_structure(con):
    assert con.sql(
        "SELECT json_strip_nulls('{\"a\":null,\"b\":1}')").rows() == \
        [('{"b":1}',)]
    assert con.sql(
        "SELECT json_structure('{\"a\":1,\"b\":[1.5],\"s\":\"x\"}')"
    ).rows() == [('{"a":"UBIGINT","b":["DOUBLE"],"s":"VARCHAR"}',)]


def test_json_group_array(con):
    con.sql("CREATE TABLE t (g INT, x INT)")
    con.sql("INSERT INTO t VALUES (1, 10), (1, 20), (2, 30), (2, NULL)")
    rows = con.sql(
        "SELECT g, json_group_array(x) FROM t GROUP BY g ORDER BY g").rows()
    assert rows == [(1, "[10,20]"), (2, "[30,null]")]


def test_arrow_in_where_and_lambda_still_works(con):
    rows = con.sql(
        "SELECT count(*) FROM j WHERE d ->> 'a' = '1'").rows()
    assert rows == [(1,)]
    # single-arrow lambdas with non-literal bodies still parse
    assert con.sql(
        "SELECT list_transform([1,2], x -> x + 1)").rows() == [([2, 3],)]
