"""JSON ingest + scalar functions."""

import pytest


@pytest.fixture()
def con(tmp_path):
    import duckdb_tpu

    p = tmp_path / "data.ndjson"
    p.write_text(
        '{"id": 1, "name": "alice", "tags": ["a","b"], "score": 9.5}\n'
        '{"id": 2, "name": "bob", "score": 7}\n'
        '{"id": 3, "name": "carol", "tags": ["x"], "meta": {"city": "NYC"}}\n')
    c = duckdb_tpu.connect()
    c._json_path = str(p)
    return c


def test_read_ndjson(con):
    rows = con.sql(
        f"SELECT id, name, score FROM '{con._json_path}' ORDER BY id").rows()
    assert rows == [(1, "alice", 9.5), (2, "bob", 7.0), (3, "carol", None)]


def test_json_array_length(con):
    rows = con.sql(
        f"SELECT name, json_array_length(tags) FROM "
        f"read_json('{con._json_path}') WHERE tags IS NOT NULL "
        f"ORDER BY id").rows()
    assert rows == [("alice", 2), ("carol", 1)]


def test_json_extract(con):
    rows = con.sql(
        f"SELECT json_extract_string(meta, '$.city') FROM "
        f"'{con._json_path}' WHERE meta IS NOT NULL").rows()
    assert rows == [("NYC",)]


def test_json_type_and_valid(con):
    rows = con.sql(
        f"SELECT json_type(tags), json_valid(name) FROM "
        f"'{con._json_path}' WHERE id = 1").rows()
    assert rows == [("ARRAY", False)]


def test_json_array_file(tmp_path):
    import duckdb_tpu

    p = tmp_path / "arr.json"
    p.write_text('[{"a": 1}, {"a": 2}, {"a": null}]')
    con = duckdb_tpu.connect()
    assert con.sql(f"SELECT sum(a), count(*) FROM '{p}'").rows() == [(3, 3)]
