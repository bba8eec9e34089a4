"""C API (embedding surface): drive libduckdb_tpu.so through ctypes.

Loading the shared library inside this Python process exercises the same
ABI a C program would use (the library attaches to the running interpreter
via PyGILState; standalone embedding initializes its own). Parity target:
the core lifecycle of the reference C API (duckdb_open/connect/query/
value accessors/prepared/appender, /root/reference/src/include/duckdb.h).
"""

import ctypes as C
import os
import subprocess

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
LIB = os.path.join(ROOT, "build", "capi", "libduckdb_tpu.so")


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(LIB):
        subprocess.run(["bash", os.path.join(ROOT, "tools", "capi",
                                             "build.sh")], check=True)
    import duckdb_tpu  # make sure the engine is importable first  # noqa

    lib = C.CDLL(LIB)
    V, U = C.c_void_p, C.c_uint64
    lib.duckdb_open.argtypes = [C.c_char_p, C.POINTER(V)]
    lib.duckdb_connect.argtypes = [V, C.POINTER(V)]
    lib.duckdb_query.argtypes = [V, C.c_char_p, V]
    for f, res in [("duckdb_column_count", U), ("duckdb_row_count", U)]:
        getattr(lib, f).argtypes = [V]
        getattr(lib, f).restype = res
    for f, res in [("duckdb_column_name", C.c_char_p),
                   ("duckdb_column_type", C.c_int)]:
        getattr(lib, f).argtypes = [V, U]
        getattr(lib, f).restype = res
    for f, res in [("duckdb_value_int64", C.c_int64),
                   ("duckdb_value_double", C.c_double),
                   ("duckdb_value_varchar", V),
                   ("duckdb_value_is_null", C.c_bool),
                   ("duckdb_value_boolean", C.c_bool)]:
        getattr(lib, f).argtypes = [V, U, U]
        getattr(lib, f).restype = res
    lib.duckdb_free.argtypes = [V]
    lib.duckdb_result_error.argtypes = [V]
    lib.duckdb_result_error.restype = C.c_char_p
    lib.duckdb_library_version.restype = C.c_char_p
    lib.duckdb_prepare.argtypes = [V, C.c_char_p, C.POINTER(V)]
    lib.duckdb_bind_int64.argtypes = [V, U, C.c_int64]
    lib.duckdb_bind_double.argtypes = [V, U, C.c_double]
    lib.duckdb_bind_varchar.argtypes = [V, U, C.c_char_p]
    lib.duckdb_bind_null.argtypes = [V, U]
    lib.duckdb_execute_prepared.argtypes = [V, V]
    lib.duckdb_appender_create.argtypes = [V, C.c_char_p, C.c_char_p,
                                           C.POINTER(V)]
    lib.duckdb_append_int64.argtypes = [V, C.c_int64]
    lib.duckdb_append_double.argtypes = [V, C.c_double]
    lib.duckdb_append_varchar.argtypes = [V, C.c_char_p]
    lib.duckdb_append_null.argtypes = [V]
    lib.duckdb_appender_end_row.argtypes = [V]
    lib.duckdb_appender_destroy.argtypes = [C.POINTER(V)]
    return lib


class Result(C.Structure):
    _fields_ = [("internal_data", C.c_void_p)]


def _varchar(lib, res, col, row):
    p = lib.duckdb_value_varchar(C.byref(res), col, row)
    if not p:
        return None
    s = C.cast(p, C.c_char_p).value.decode()
    lib.duckdb_free(p)
    return s


def test_capi_lifecycle(lib):
    db = C.c_void_p()
    assert lib.duckdb_open(b":memory:", C.byref(db)) == 0
    con = C.c_void_p()
    assert lib.duckdb_connect(db, C.byref(con)) == 0
    assert b"duckdb_tpu" in lib.duckdb_library_version()

    res = Result()
    assert lib.duckdb_query(con, b"CREATE TABLE t (a INT, s VARCHAR)",
                            C.byref(res)) == 0
    lib.duckdb_destroy_result(C.byref(res))
    assert lib.duckdb_query(
        con, b"INSERT INTO t VALUES (1,'x'),(2,NULL),(3,'z')",
        C.byref(res)) == 0
    lib.duckdb_destroy_result(C.byref(res))

    assert lib.duckdb_query(
        con, b"SELECT a, s, a * 2.5 AS d FROM t ORDER BY a",
        C.byref(res)) == 0
    assert lib.duckdb_column_count(C.byref(res)) == 3
    assert lib.duckdb_row_count(C.byref(res)) == 3
    assert lib.duckdb_column_name(C.byref(res), 0) == b"a"
    assert lib.duckdb_value_int64(C.byref(res), 0, 2) == 3
    assert _varchar(lib, res, 1, 0) == "x"
    assert lib.duckdb_value_is_null(C.byref(res), 1, 1)
    assert _varchar(lib, res, 1, 1) is None
    assert abs(lib.duckdb_value_double(C.byref(res), 2, 1) - 5.0) < 1e-9
    lib.duckdb_destroy_result(C.byref(res))

    # error propagation
    assert lib.duckdb_query(con, b"SELECT * FROM missing_table",
                            C.byref(res)) == 1
    err = lib.duckdb_result_error(C.byref(res))
    assert err and b"missing_table" in err
    lib.duckdb_destroy_result(C.byref(res))

    lib.duckdb_disconnect(C.byref(con))
    lib.duckdb_close(C.byref(db))


def test_capi_prepared(lib):
    db, con = C.c_void_p(), C.c_void_p()
    lib.duckdb_open(b":memory:", C.byref(db))
    lib.duckdb_connect(db, C.byref(con))
    res = Result()
    lib.duckdb_query(con, b"CREATE TABLE p (a INT, b VARCHAR)",
                     C.byref(res))
    lib.duckdb_destroy_result(C.byref(res))
    stmt = C.c_void_p()
    assert lib.duckdb_prepare(con, b"INSERT INTO p VALUES (?, ?)",
                              C.byref(stmt)) == 0
    assert lib.duckdb_bind_int64(stmt, 1, 42) == 0
    assert lib.duckdb_bind_varchar(stmt, 2, b"hello") == 0
    assert lib.duckdb_execute_prepared(stmt, C.byref(res)) == 0
    lib.duckdb_destroy_result(C.byref(res))
    lib.duckdb_destroy_prepare(C.byref(stmt))

    lib.duckdb_query(con, b"SELECT b FROM p WHERE a = 42", C.byref(res))
    assert _varchar(lib, res, 0, 0) == "hello"
    lib.duckdb_destroy_result(C.byref(res))
    lib.duckdb_disconnect(C.byref(con))
    lib.duckdb_close(C.byref(db))


def test_capi_appender(lib):
    db, con = C.c_void_p(), C.c_void_p()
    lib.duckdb_open(b":memory:", C.byref(db))
    lib.duckdb_connect(db, C.byref(con))
    res = Result()
    lib.duckdb_query(con, b"CREATE TABLE ap (i BIGINT, x DOUBLE, s VARCHAR)",
                     C.byref(res))
    lib.duckdb_destroy_result(C.byref(res))
    app = C.c_void_p()
    assert lib.duckdb_appender_create(con, None, b"ap", C.byref(app)) == 0
    for i in range(100):
        lib.duckdb_append_int64(app, i)
        lib.duckdb_append_double(app, i * 0.5)
        if i % 10 == 0:
            lib.duckdb_append_null(app)
        else:
            lib.duckdb_append_varchar(app, f"s{i}".encode())
        assert lib.duckdb_appender_end_row(app) == 0
    assert lib.duckdb_appender_destroy(C.byref(app)) == 0
    lib.duckdb_query(con,
                     b"SELECT count(*), sum(i), count(s) FROM ap",
                     C.byref(res))
    assert lib.duckdb_value_int64(C.byref(res), 0, 0) == 100
    assert lib.duckdb_value_int64(C.byref(res), 1, 0) == 4950
    assert lib.duckdb_value_int64(C.byref(res), 2, 0) == 90
    lib.duckdb_destroy_result(C.byref(res))
    lib.duckdb_disconnect(C.byref(con))
    lib.duckdb_close(C.byref(db))
