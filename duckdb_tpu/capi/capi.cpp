/* duckdb_tpu C API implementation: embeds CPython hosting the engine.
 *
 * Mirrors the reference's C API semantics
 * (/root/reference/src/main/capi/, src/include/duckdb.h) for the core
 * lifecycle. Query results are materialized once into C++-owned columnar
 * buffers (per column: null bitmap + int64 / double / std::string plane),
 * so value accessors are plain memory reads — no Python re-entry, no GIL.
 *
 * Build: tools/capi/build.sh → libduckdb_tpu.so
 * The library works both embedded in a C program (it initializes Python
 * itself) and dlopen'd inside an existing Python process (it attaches to
 * the running interpreter via PyGILState).
 */

#include "duckdb_tpu.h"

#include <Python.h>

#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <vector>

namespace {

std::once_flag g_py_init;

void ensure_python() {
  std::call_once(g_py_init, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      // release the GIL owned by this init so PyGILState_Ensure works
      // uniformly from any caller thread
      PyEval_SaveThread();
    }
  });
}

struct GIL {
  PyGILState_STATE st;
  GIL() { st = PyGILState_Ensure(); }
  ~GIL() { PyGILState_Release(st); }
};

PyObject *bridge() {
  static PyObject *mod = nullptr;
  if (!mod) {
    mod = PyImport_ImportModule("duckdb_tpu.capi.bridge");
    if (!mod) {
      PyErr_Print();
    }
  }
  return mod;
}

std::string py_err() {
  PyObject *type, *value, *tb;
  PyErr_Fetch(&type, &value, &tb);
  std::string msg = "unknown error";
  if (value) {
    PyObject *s = PyObject_Str(value);
    if (s) {
      msg = PyUnicode_AsUTF8(s);
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
  return msg;
}

struct Database {
  std::string path;
};

struct ConnectionImpl {
  PyObject *con = nullptr;  // python Connection
  ~ConnectionImpl() {
    if (con) {
      GIL g;
      Py_DECREF(con);
    }
  }
};

struct Col {
  std::string name;
  duckdb_type type = DUCKDB_TYPE_INVALID;
  char cls = 's';  // 'i' | 'f' | 's'
  std::vector<uint8_t> nulls;
  std::vector<int64_t> ints;
  std::vector<double> dbls;
  std::vector<std::string> strs;
};

struct ResultImpl {
  std::vector<Col> cols;
  idx_t rows = 0;
  std::string error;
  bool ok = true;
};

ResultImpl *materialize(PyObject *tuple) {
  auto *r = new ResultImpl();
  PyObject *names = PyTuple_GetItem(tuple, 0);
  PyObject *tids = PyTuple_GetItem(tuple, 1);
  PyObject *classes = PyTuple_GetItem(tuple, 2);
  PyObject *cols = PyTuple_GetItem(tuple, 3);
  Py_ssize_t nc = PyList_Size(names);
  for (Py_ssize_t c = 0; c < nc; c++) {
    Col col;
    col.name = PyUnicode_AsUTF8(PyList_GetItem(names, c));
    col.type = (duckdb_type)PyLong_AsLong(PyList_GetItem(tids, c));
    col.cls = PyUnicode_AsUTF8(PyList_GetItem(classes, c))[0];
    PyObject *cells = PyList_GetItem(cols, c);
    Py_ssize_t nr = PyList_Size(cells);
    col.nulls.resize(nr);
    for (Py_ssize_t i = 0; i < nr; i++) {
      PyObject *cell = PyList_GetItem(cells, i);
      col.nulls[i] = PyObject_IsTrue(PyTuple_GetItem(cell, 0)) ? 1 : 0;
      PyObject *v = PyTuple_GetItem(cell, 1);
      if (col.cls == 'i') {
        col.ints.push_back(PyLong_AsLongLong(v));
      } else if (col.cls == 'f') {
        col.dbls.push_back(PyFloat_AsDouble(v));
      } else {
        col.strs.push_back(PyUnicode_AsUTF8(v));
      }
    }
    r->rows = (idx_t)nr;
    r->cols.push_back(std::move(col));
  }
  return r;
}

duckdb_state run_sql_object(PyObject *callable_result, duckdb_result *out) {
  if (!callable_result) {
    auto *r = new ResultImpl();
    r->ok = false;
    r->error = py_err();
    if (out) out->internal_data = r;
    return DuckDBError;
  }
  if (out) {
    out->internal_data = materialize(callable_result);
  }
  Py_DECREF(callable_result);
  return DuckDBSuccess;
}

ResultImpl *impl(duckdb_result *r) {
  return r ? (ResultImpl *)r->internal_data : nullptr;
}

struct PreparedImpl {
  PyObject *stmt = nullptr;
  std::vector<PyObject *> params;  // owned refs, index 0-based
  ~PreparedImpl() {
    GIL g;
    for (auto *p : params) Py_XDECREF(p);
    Py_XDECREF(stmt);
  }
  void set(idx_t idx, PyObject *v /*stolen*/) {
    if (params.size() < idx) params.resize(idx, nullptr);
    Py_XDECREF(params[idx - 1]);
    params[idx - 1] = v;
  }
};

struct AppenderImpl {
  PyObject *app = nullptr;
  std::vector<PyObject *> row;  // owned refs
  ~AppenderImpl() {
    GIL g;
    for (auto *p : row) Py_XDECREF(p);
    Py_XDECREF(app);
  }
};

}  // namespace

extern "C" {

duckdb_state duckdb_open(const char *path, duckdb_database *out_database) {
  ensure_python();
  auto *db = new Database();
  db->path = path ? path : ":memory:";
  *out_database = (duckdb_database) new _duckdb_database{db};
  return DuckDBSuccess;
}

void duckdb_close(duckdb_database *database) {
  if (database && *database) {
    delete (Database *)(*database)->internal;
    delete *database;
    *database = nullptr;
  }
}

const char *duckdb_library_version(void) { return "duckdb_tpu 0.2.0"; }

duckdb_state duckdb_connect(duckdb_database database,
                            duckdb_connection *out_connection) {
  ensure_python();
  GIL g;
  auto *db = (Database *)database->internal;
  PyObject *b = bridge();
  if (!b) return DuckDBError;
  PyObject *con =
      PyObject_CallMethod(b, "connect", "s", db->path.c_str());
  if (!con) {
    PyErr_Print();
    return DuckDBError;
  }
  auto *ci = new ConnectionImpl();
  ci->con = con;
  *out_connection = (duckdb_connection) new _duckdb_connection{ci};
  return DuckDBSuccess;
}

void duckdb_disconnect(duckdb_connection *connection) {
  if (connection && *connection) {
    delete (ConnectionImpl *)(*connection)->internal;
    delete *connection;
    *connection = nullptr;
  }
}

duckdb_state duckdb_query(duckdb_connection connection, const char *query,
                          duckdb_result *out_result) {
  GIL g;
  auto *ci = (ConnectionImpl *)connection->internal;
  PyObject *res =
      PyObject_CallMethod(bridge(), "query", "Os", ci->con, query);
  return run_sql_object(res, out_result);
}

void duckdb_destroy_result(duckdb_result *result) {
  if (result && result->internal_data) {
    delete impl(result);
    result->internal_data = nullptr;
  }
}

const char *duckdb_result_error(duckdb_result *result) {
  auto *r = impl(result);
  return (r && !r->ok) ? r->error.c_str() : nullptr;
}

idx_t duckdb_column_count(duckdb_result *result) {
  auto *r = impl(result);
  return r ? (idx_t)r->cols.size() : 0;
}

idx_t duckdb_row_count(duckdb_result *result) {
  auto *r = impl(result);
  return r ? r->rows : 0;
}

const char *duckdb_column_name(duckdb_result *result, idx_t col) {
  auto *r = impl(result);
  return (r && col < r->cols.size()) ? r->cols[col].name.c_str() : nullptr;
}

duckdb_type duckdb_column_type(duckdb_result *result, idx_t col) {
  auto *r = impl(result);
  return (r && col < r->cols.size()) ? r->cols[col].type
                                     : DUCKDB_TYPE_INVALID;
}

bool duckdb_value_is_null(duckdb_result *result, idx_t col, idx_t row) {
  auto *r = impl(result);
  if (!r || col >= r->cols.size() || row >= r->rows) return true;
  return r->cols[col].nulls[row] != 0;
}

bool duckdb_value_boolean(duckdb_result *result, idx_t col, idx_t row) {
  return duckdb_value_int64(result, col, row) != 0;
}

int64_t duckdb_value_int64(duckdb_result *result, idx_t col, idx_t row) {
  auto *r = impl(result);
  if (!r || col >= r->cols.size() || row >= r->rows) return 0;
  const Col &c = r->cols[col];
  if (c.nulls[row]) return 0;
  if (c.cls == 'i') return c.ints[row];
  if (c.cls == 'f') return (int64_t)c.dbls[row];
  return atoll(c.strs[row].c_str());
}

double duckdb_value_double(duckdb_result *result, idx_t col, idx_t row) {
  auto *r = impl(result);
  if (!r || col >= r->cols.size() || row >= r->rows) return 0.0;
  const Col &c = r->cols[col];
  if (c.nulls[row]) return 0.0;
  if (c.cls == 'f') return c.dbls[row];
  if (c.cls == 'i') return (double)c.ints[row];
  return atof(c.strs[row].c_str());
}

char *duckdb_value_varchar(duckdb_result *result, idx_t col, idx_t row) {
  auto *r = impl(result);
  if (!r || col >= r->cols.size() || row >= r->rows) return nullptr;
  const Col &c = r->cols[col];
  if (c.nulls[row]) return nullptr;
  std::string s;
  if (c.cls == 's') {
    s = c.strs[row];
  } else if (c.cls == 'i') {
    s = std::to_string(c.ints[row]);
  } else {
    char buf[32];
    snprintf(buf, sizeof buf, "%g", c.dbls[row]);
    s = buf;
  }
  char *out = (char *)malloc(s.size() + 1);
  memcpy(out, s.c_str(), s.size() + 1);
  return out;
}

void duckdb_free(void *ptr) { free(ptr); }

/* -- prepared statements ---------------------------------------------------- */

duckdb_state duckdb_prepare(duckdb_connection connection, const char *query,
                            duckdb_prepared_statement *out) {
  GIL g;
  auto *ci = (ConnectionImpl *)connection->internal;
  PyObject *stmt =
      PyObject_CallMethod(bridge(), "prepare", "Os", ci->con, query);
  if (!stmt) {
    PyErr_Print();
    return DuckDBError;
  }
  auto *pi = new PreparedImpl();
  pi->stmt = stmt;
  *out = (duckdb_prepared_statement) new _duckdb_prepared{pi};
  return DuckDBSuccess;
}

void duckdb_destroy_prepare(duckdb_prepared_statement *stmt) {
  if (stmt && *stmt) {
    delete (PreparedImpl *)(*stmt)->internal;
    delete *stmt;
    *stmt = nullptr;
  }
}

duckdb_state duckdb_bind_int64(duckdb_prepared_statement stmt, idx_t idx,
                               int64_t val) {
  GIL g;
  ((PreparedImpl *)stmt->internal)->set(idx, PyLong_FromLongLong(val));
  return DuckDBSuccess;
}

duckdb_state duckdb_bind_double(duckdb_prepared_statement stmt, idx_t idx,
                                double val) {
  GIL g;
  ((PreparedImpl *)stmt->internal)->set(idx, PyFloat_FromDouble(val));
  return DuckDBSuccess;
}

duckdb_state duckdb_bind_varchar(duckdb_prepared_statement stmt, idx_t idx,
                                 const char *val) {
  GIL g;
  ((PreparedImpl *)stmt->internal)->set(idx, PyUnicode_FromString(val));
  return DuckDBSuccess;
}

duckdb_state duckdb_bind_null(duckdb_prepared_statement stmt, idx_t idx) {
  GIL g;
  Py_INCREF(Py_None);
  ((PreparedImpl *)stmt->internal)->set(idx, Py_None);
  return DuckDBSuccess;
}

duckdb_state duckdb_execute_prepared(duckdb_prepared_statement stmt,
                                     duckdb_result *out_result) {
  GIL g;
  auto *pi = (PreparedImpl *)stmt->internal;
  PyObject *params = PyList_New((Py_ssize_t)pi->params.size());
  for (size_t i = 0; i < pi->params.size(); i++) {
    PyObject *p = pi->params[i] ? pi->params[i] : Py_None;
    Py_INCREF(p);
    PyList_SetItem(params, (Py_ssize_t)i, p);
  }
  PyObject *res = PyObject_CallMethod(bridge(), "run_prepared", "OO",
                                      pi->stmt, params);
  Py_DECREF(params);
  return run_sql_object(res, out_result);
}

/* -- appender ----------------------------------------------------------------- */

duckdb_state duckdb_appender_create(duckdb_connection connection,
                                    const char *schema, const char *table,
                                    duckdb_appender *out) {
  (void)schema;
  GIL g;
  auto *ci = (ConnectionImpl *)connection->internal;
  PyObject *app = PyObject_CallMethod(bridge(), "appender_create", "Os",
                                      ci->con, table);
  if (!app) {
    PyErr_Print();
    return DuckDBError;
  }
  auto *ai = new AppenderImpl();
  ai->app = app;
  *out = (duckdb_appender) new _duckdb_appender{ai};
  return DuckDBSuccess;
}

static duckdb_state append_obj(duckdb_appender appender, PyObject *v) {
  ((AppenderImpl *)appender->internal)->row.push_back(v);
  return DuckDBSuccess;
}

duckdb_state duckdb_append_int64(duckdb_appender a, int64_t v) {
  GIL g;
  return append_obj(a, PyLong_FromLongLong(v));
}

duckdb_state duckdb_append_double(duckdb_appender a, double v) {
  GIL g;
  return append_obj(a, PyFloat_FromDouble(v));
}

duckdb_state duckdb_append_varchar(duckdb_appender a, const char *v) {
  GIL g;
  return append_obj(a, PyUnicode_FromString(v));
}

duckdb_state duckdb_append_null(duckdb_appender a) {
  GIL g;
  Py_INCREF(Py_None);
  return append_obj(a, Py_None);
}

duckdb_state duckdb_appender_end_row(duckdb_appender a) {
  GIL g;
  auto *ai = (AppenderImpl *)a->internal;
  PyObject *row = PyList_New((Py_ssize_t)ai->row.size());
  for (size_t i = 0; i < ai->row.size(); i++) {
    PyList_SetItem(row, (Py_ssize_t)i, ai->row[i]);  // steals
  }
  ai->row.clear();
  PyObject *r =
      PyObject_CallMethod(bridge(), "append_row", "OO", ai->app, row);
  Py_DECREF(row);
  if (!r) {
    PyErr_Print();
    return DuckDBError;
  }
  Py_DECREF(r);
  return DuckDBSuccess;
}

duckdb_state duckdb_appender_flush(duckdb_appender a) {
  GIL g;
  auto *ai = (AppenderImpl *)a->internal;
  PyObject *r = PyObject_CallMethod(bridge(), "appender_flush", "O", ai->app);
  if (!r) {
    PyErr_Print();
    return DuckDBError;
  }
  Py_DECREF(r);
  return DuckDBSuccess;
}

duckdb_state duckdb_appender_destroy(duckdb_appender *a) {
  if (a && *a) {
    duckdb_appender_flush(*a);
    delete (AppenderImpl *)(*a)->internal;
    delete *a;
    *a = nullptr;
  }
  return DuckDBSuccess;
}

}  // extern "C"
