/* duckdb_tpu C API — the embedding surface of the TPU-native engine.
 *
 * Shape-compatible subset of the reference C API
 * (/root/reference/src/include/duckdb.h): open/connect/query lifecycle,
 * result introspection, typed value accessors, prepared statements and
 * the appender. The implementation (capi.cpp) embeds a CPython
 * interpreter hosting the engine; results are materialized into C-owned
 * buffers so accessors never re-enter Python.
 */
#ifndef DUCKDB_TPU_C_H
#define DUCKDB_TPU_C_H

#include <stdbool.h>
#include <stdint.h>
#include <stdlib.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef uint64_t idx_t;

typedef enum { DuckDBSuccess = 0, DuckDBError = 1 } duckdb_state;

typedef enum {
  DUCKDB_TYPE_INVALID = 0,
  DUCKDB_TYPE_BOOLEAN = 1,
  DUCKDB_TYPE_TINYINT = 2,
  DUCKDB_TYPE_SMALLINT = 3,
  DUCKDB_TYPE_INTEGER = 4,
  DUCKDB_TYPE_BIGINT = 5,
  DUCKDB_TYPE_FLOAT = 10,
  DUCKDB_TYPE_DOUBLE = 11,
  DUCKDB_TYPE_TIMESTAMP = 12,
  DUCKDB_TYPE_DATE = 13,
  DUCKDB_TYPE_TIME = 14,
  DUCKDB_TYPE_INTERVAL = 15,
  DUCKDB_TYPE_HUGEINT = 16,
  DUCKDB_TYPE_VARCHAR = 17,
  DUCKDB_TYPE_BLOB = 18,
  DUCKDB_TYPE_DECIMAL = 19,
  DUCKDB_TYPE_LIST = 24,
  DUCKDB_TYPE_STRUCT = 25,
  DUCKDB_TYPE_MAP = 26,
} duckdb_type;

typedef struct _duckdb_database { void *internal; } * duckdb_database;
typedef struct _duckdb_connection { void *internal; } * duckdb_connection;
typedef struct _duckdb_prepared { void *internal; } * duckdb_prepared_statement;
typedef struct _duckdb_appender { void *internal; } * duckdb_appender;

typedef struct { void *internal_data; } duckdb_result;

/* -- open / close --------------------------------------------------------- */
duckdb_state duckdb_open(const char *path, duckdb_database *out_database);
void duckdb_close(duckdb_database *database);
duckdb_state duckdb_connect(duckdb_database database,
                            duckdb_connection *out_connection);
void duckdb_disconnect(duckdb_connection *connection);
const char *duckdb_library_version(void);

/* -- query ----------------------------------------------------------------- */
duckdb_state duckdb_query(duckdb_connection connection, const char *query,
                          duckdb_result *out_result);
void duckdb_destroy_result(duckdb_result *result);
const char *duckdb_result_error(duckdb_result *result);

idx_t duckdb_column_count(duckdb_result *result);
idx_t duckdb_row_count(duckdb_result *result);
const char *duckdb_column_name(duckdb_result *result, idx_t col);
duckdb_type duckdb_column_type(duckdb_result *result, idx_t col);

/* -- typed value accessors (row-major random access) ------------------------ */
bool duckdb_value_is_null(duckdb_result *result, idx_t col, idx_t row);
bool duckdb_value_boolean(duckdb_result *result, idx_t col, idx_t row);
int64_t duckdb_value_int64(duckdb_result *result, idx_t col, idx_t row);
double duckdb_value_double(duckdb_result *result, idx_t col, idx_t row);
/* returns a malloc'd utf-8 string; free with duckdb_free */
char *duckdb_value_varchar(duckdb_result *result, idx_t col, idx_t row);
void duckdb_free(void *ptr);

/* -- prepared statements ----------------------------------------------------- */
duckdb_state duckdb_prepare(duckdb_connection connection, const char *query,
                            duckdb_prepared_statement *out);
void duckdb_destroy_prepare(duckdb_prepared_statement *stmt);
duckdb_state duckdb_bind_int64(duckdb_prepared_statement stmt, idx_t idx,
                               int64_t val);
duckdb_state duckdb_bind_double(duckdb_prepared_statement stmt, idx_t idx,
                                double val);
duckdb_state duckdb_bind_varchar(duckdb_prepared_statement stmt, idx_t idx,
                                 const char *val);
duckdb_state duckdb_bind_null(duckdb_prepared_statement stmt, idx_t idx);
duckdb_state duckdb_execute_prepared(duckdb_prepared_statement stmt,
                                     duckdb_result *out_result);

/* -- appender ---------------------------------------------------------------- */
duckdb_state duckdb_appender_create(duckdb_connection connection,
                                    const char *schema, const char *table,
                                    duckdb_appender *out);
duckdb_state duckdb_append_int64(duckdb_appender appender, int64_t value);
duckdb_state duckdb_append_double(duckdb_appender appender, double value);
duckdb_state duckdb_append_varchar(duckdb_appender appender, const char *val);
duckdb_state duckdb_append_null(duckdb_appender appender);
duckdb_state duckdb_appender_end_row(duckdb_appender appender);
duckdb_state duckdb_appender_flush(duckdb_appender appender);
duckdb_state duckdb_appender_destroy(duckdb_appender *appender);

#ifdef __cplusplus
}
#endif
#endif /* DUCKDB_TPU_C_H */
