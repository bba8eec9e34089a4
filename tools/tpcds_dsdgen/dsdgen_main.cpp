// Standalone TPC-DS data generator: links the TPC Council's dsdgen core
// from the reference's vendored tree (/root/reference/extension/tpcds/
// dsdgen/dsdgen-c — nothing copied into this repo) and implements the
// generator's C append interface (append_info.h) as a pipe-separated
// .dat writer, the TPC toolkit's own output format. This replaces the
// reference *binary* as the data oracle for tests/test_tpcds.py, making
// the repo self-verifying (reference analog: extension/tpcds/dsdgen.cpp
// drives the same builders into duckdb Appenders).
//
// Usage: dsdgen_tbl <scale> <outdir>

#define DECLARER
#include "build_support.h"
#include "config.h"
#include "dist.h"
#include "genrand.h"
#include "params.h"
#include "parallel.h"
#include "porting.h"
#include "scaling.h"
#include "tdefs.h"
#include "init.h"
#include "tables.h"
#include "append_info.h"

#include <cinttypes>
#include <cstdio>
#include <cstring>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

struct DatWriter {
    FILE *f = nullptr;
    tdef *def = nullptr;
    bool row_open = false;
    bool first_col = true;

    void sep() {
        if (!first_col)
            fputc('|', f);
        first_col = false;
    }
    bool is_null(int nColumn) const {
        int off = nColumn - def->nFirstColumn;
        return (def->kNullBitMap & (int64_t(1) << off)) != 0;
    }
};

std::vector<DatWriter> g_writers;

}  // namespace

// --- append_info.h implementation (pipe-separated .dat, dsdgen format) ---
append_info *append_info_get(void *info_list, int table_id) {
    (void)info_list;
    return (append_info *)&g_writers[table_id];
}

void append_row_start(append_info info) {
    auto *w = (DatWriter *)info;
    w->row_open = true;
    w->first_col = true;
}

void append_row_end(append_info info) {
    auto *w = (DatWriter *)info;
    fputc('\n', w->f);
    w->row_open = false;
}

void append_varchar(append_info info, const char *value, int nColumn) {
    auto *w = (DatWriter *)info;
    w->sep();
    if (!w->is_null(nColumn) && value && *value)
        fputs(value, w->f);
}

void append_key(append_info info, int64_t value, int nColumn) {
    auto *w = (DatWriter *)info;
    w->sep();
    if (!w->is_null(nColumn) && value >= 0)
        fprintf(w->f, "%" PRId64, value);
}

void append_integer(append_info info, int32_t value, int nColumn) {
    auto *w = (DatWriter *)info;
    w->sep();
    if (!w->is_null(nColumn))
        fprintf(w->f, "%d", value);
}

void append_boolean(append_info info, int32_t value, int nColumn) {
    auto *w = (DatWriter *)info;
    w->sep();
    if (!w->is_null(nColumn))
        fputs(value ? "true" : "false", w->f);
}

// value is a Julian day number (reference: append_info-c.cpp append_date)
void append_date(append_info info, int64_t value, int nColumn) {
    auto *w = (DatWriter *)info;
    w->sep();
    if (w->is_null(nColumn) || value < 0)
        return;
    date_t d;
    jtodt(&d, (int)value);
    fprintf(w->f, "%4d-%02d-%02d", d.year, d.month, d.day);
}

void append_decimal(append_info info, decimal_t *val, int nColumn) {
    auto *w = (DatWriter *)info;
    w->sep();
    if (w->is_null(nColumn))
        return;
    double scale = 1.0;
    for (int i = 0; i < val->precision; i++)
        scale *= 10.0;
    // integer mantissa + explicit scale: render exactly
    int64_t n = val->number;
    bool neg = n < 0;
    if (neg)
        n = -n;
    int64_t ip = n;
    int64_t fp = 0;
    int64_t s = 1;
    for (int i = 0; i < val->precision; i++)
        s *= 10;
    ip = n / s;
    fp = n % s;
    if (val->precision > 0)
        fprintf(w->f, "%s%" PRId64 ".%0*" PRId64, neg ? "-" : "", ip,
                val->precision, fp);
    else
        fprintf(w->f, "%s%" PRId64, neg ? "-" : "", ip);
    (void)scale;
}

void append_integer_decimal(append_info info, int32_t val, int nColumn) {
    auto *w = (DatWriter *)info;
    w->sep();
    if (!w->is_null(nColumn))
        fprintf(w->f, "%d.00", val);
}

// --- driver -----------------------------------------------------------------
static int child_of(int table_id) {
    switch (table_id) {
    case CATALOG_SALES:
        return CATALOG_RETURNS;
    case STORE_SALES:
        return STORE_RETURNS;
    case WEB_SALES:
        return WEB_RETURNS;
    default:
        return -1;
    }
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s <scale> <outdir>\n", argv[0]);
        return 1;
    }
    double scale = atof(argv[1]);
    std::string outdir = argv[2];
    mkdir(outdir.c_str(), 0755);

    InitConstants::Reset();
    resetCountCount();
    std::string t = std::to_string(scale);
    set_str("SCALE", (char *)t.c_str());
    init_rand();

    static const int TABLES[] = {
        CALL_CENTER,  CATALOG_PAGE, CATALOG_SALES,
        CUSTOMER,     CUSTOMER_ADDRESS, CUSTOMER_DEMOGRAPHICS,
        DATET,        HOUSEHOLD_DEMOGRAPHICS, INCOME_BAND,
        INVENTORY,    ITEM,         PROMOTION,
        REASON,       SHIP_MODE,    STORE,
        STORE_SALES,  TIME,         WAREHOUSE,
        WEB_PAGE,     WEB_SALES,    WEB_SITE};

    g_writers.resize(DBGEN_VERSION + 1);
    for (int tid = 0; tid <= DBGEN_VERSION; tid++) {
        tdef *def = getSimpleTdefsByNumber(tid);
        g_writers[tid].def = def;
    }
    for (int tid : TABLES) {
        int ids[2] = {tid, child_of(tid)};
        for (int id : ids) {
            if (id < 0)
                continue;
            tdef *def = getSimpleTdefsByNumber(id);
            std::string path = outdir + "/" + def->name + ".dat";
            g_writers[id].f = fopen(path.c_str(), "w");
            if (!g_writers[id].f) {
                fprintf(stderr, "cannot open %s\n", path.c_str());
                return 1;
            }
        }
        table_func_t *funcs = getTdefFunctionsByNumber(tid);
        ds_key_t count = get_rowcount(tid);
        for (ds_key_t i = 1; i <= count; i++) {
            if (funcs->builder((void *)1, i))
                break;
            // resynchronize every column's RNG stream to its nominal
            // per-row consumption (the TPC kit's driver contract; without
            // it NULL bitmaps and pricing drift from the canonical data)
            row_stop(tid);
        }
        for (int id : ids) {
            if (id >= 0 && g_writers[id].f) {
                fclose(g_writers[id].f);
                g_writers[id].f = nullptr;
            }
        }
        fprintf(stderr, "%s: %" PRId64 " rows\n",
                getSimpleTdefsByNumber(tid)->name, (int64_t)count);
    }
    return 0;
}
