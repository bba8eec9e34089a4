"""ENUM user types (CREATE TYPE ... AS ENUM) and the UUID surface.

Reference: src/core_functions/scalar/enum/enum_functions.cpp,
src/common/types/uuid.cpp, src/parser/parsed_data/create_type_info.hpp.

Known divergence (documented): enums ride the dict-encoded string plane,
so ORDER BY over an enum column is lexicographic, not definition-order
(the reference orders by enum position).
"""

import pytest

import duckdb_tpu


@pytest.fixture
def con():
    return duckdb_tpu.connect()


def test_create_enum_cast_and_validate(con):
    con.sql("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    assert con.sql("SELECT 'ok'::mood").rows() == [("ok",)]
    with pytest.raises(Exception, match="Could not convert"):
        con.sql("SELECT 'angry'::mood")
    assert con.sql("SELECT TRY_CAST('angry' AS mood)").rows() == [(None,)]


def test_enum_metadata_functions(con):
    con.sql("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    assert con.sql("SELECT enum_range(NULL::mood)").rows() == \
        [(["sad", "ok", "happy"],)]
    assert con.sql("SELECT enum_first(NULL::mood), enum_last(NULL::mood)"
                   ).rows() == [("sad", "happy")]
    assert con.sql("SELECT enum_code('happy'::mood)").rows() == [(2,)]
    assert con.sql("SELECT enum_range_boundary('sad'::mood, 'ok'::mood)"
                   ).rows() == [(["sad", "ok"],)]


def test_enum_column_ddl(con):
    con.sql("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    con.sql("CREATE TABLE people (name VARCHAR, m mood)")
    con.sql("INSERT INTO people VALUES ('a', 'happy'), ('b', 'sad')")
    assert con.sql("SELECT count(*) FROM people WHERE m = 'happy'"
                   ).rows() == [(1,)]


def test_drop_type(con):
    con.sql("CREATE TYPE mood AS ENUM ('sad')")
    con.sql("DROP TYPE mood")
    with pytest.raises(Exception, match="unknown type"):
        con.sql("SELECT 'sad'::mood")
    with pytest.raises(Exception, match="does not exist"):
        con.sql("DROP TYPE mood")
    con.sql("DROP TYPE IF EXISTS mood")


def test_create_type_alias(con):
    con.sql("CREATE TYPE money AS DECIMAL(18, 2)")
    assert con.sql("SELECT '1.5'::money").rows()[0][0] is not None


def test_enum_persistence(tmp_path):
    db = str(tmp_path / "enumdb")
    con = duckdb_tpu.connect(db)
    con.sql("CREATE TYPE mood AS ENUM ('sad', 'ok')")
    con.sql("CREATE TABLE t (m mood)")
    con.sql("INSERT INTO t VALUES ('ok')")
    con.close()
    con2 = duckdb_tpu.connect(db)
    assert con2.sql("SELECT enum_range(NULL::mood)").rows() == \
        [(["sad", "ok"],)]
    assert con2.sql("SELECT * FROM t").rows() == [("ok",)]
    con2.close()


def test_uuid_type_and_functions(con):
    u = "550e8400-e29b-41d4-a716-446655440000"
    assert con.sql(f"SELECT uuid_extract_version('{u}')").rows() == [(4,)]
    con.sql("CREATE TABLE ids (id UUID)")
    con.sql(f"INSERT INTO ids VALUES ('{u}'), (gen_random_uuid())")
    assert con.sql("SELECT count(DISTINCT id) FROM ids").rows() == [(2,)]
    (v4, v7) = con.sql(
        "SELECT uuid_extract_version(uuidv4()), "
        "uuid_extract_version(uuidv7())").rows()[0]
    assert (v4, v7) == (4, 7)


def test_uuidv7_timestamp_is_recent(con):
    import datetime

    (ts,) = con.sql("SELECT uuid_extract_timestamp(uuidv7())").rows()[0]
    assert ts.year >= 2024


def test_collate_comparisons(con):
    rows = con.sql("SELECT 'a' COLLATE NOCASE = 'A', "
                   "'hëllo' = 'hello' COLLATE NOACCENT, "
                   "'MiXeD' COLLATE NOCASE.NOACCENT = 'mïxed'").rows()
    assert rows == [(True, True, True)]


def test_collate_order_by(con):
    con.sql("CREATE TABLE cs (v VARCHAR)")
    con.sql("INSERT INTO cs VALUES ('b'), ('A'), ('C'), ('a')")
    assert con.sql("SELECT v FROM cs ORDER BY v COLLATE NOCASE, v"
                   ).rows() == [("A",), ("a",), ("b",), ("C",)]


def test_collate_unknown_errors(con):
    with pytest.raises(Exception, match="Collation"):
        con.sql("SELECT 'x' COLLATE BOGUS = 'x'")


def test_scalar_range_generate_series(con):
    rows = con.sql("SELECT range(3), range(1, 4), range(0, 10, 3), "
                   "generate_series(1, 3), generate_series(5, 1, -2)").rows()
    assert rows == [(
        [0, 1, 2], [1, 2, 3], [0, 3, 6, 9], [1, 2, 3], [5, 3, 1])]
