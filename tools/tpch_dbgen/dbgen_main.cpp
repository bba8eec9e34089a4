/*
 * Standalone TPC-H data generator driver.
 *
 * Links the vendored TPC dbgen core (mk_part/mk_supp/mk_cust/mk_order/...,
 * Copyright Transaction Processing Performance Council, mounted read-only at
 * /root/reference/extension/tpch/dbgen — compiled out-of-tree, not copied)
 * and writes binary columnar files that duckdb_tpu loads directly:
 *
 *   <out>/<table>/<col>.i64 | .i32          raw little-endian arrays
 *   <out>/<table>/<col>.len + <col>.bytes   u32 lengths + utf8 payload
 *   <out>/<table>/meta.json                 row count + column kinds
 *
 * Decimals are written as scaled int64 cents (DECIMAL(15,2)); dates as int32
 * days since 1970-01-01. Usage: dbgen_tbl <scale> <outdir>
 */

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <sys/stat.h>
#include <vector>

#define DECLARER /* instantiate the TPC core's EXTERN globals in this TU */
#include "dbgen/config.h"
#include "dbgen/dss.h"
#include "dbgen/dsstypes.h"
#include "dbgen/dbgen_gunk.hpp"

/* dss.h silences stdio with `#define fprintf(...)`; restore it for this TU */
#undef printf
#undef fprintf

// ---------------------------------------------------------------------------

static int64_t days_from_civil(int64_t y, unsigned m, unsigned d) {
	y -= m <= 2;
	int64_t era = (y >= 0 ? y : y - 399) / 400;
	unsigned yoe = (unsigned)(y - era * 400);
	unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
	unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
	return era * 146097 + (int64_t)doe - 719468;
}

static int32_t parse_date(const char *s) {
	int y, m, d;
	if (sscanf(s, "%d-%d-%d", &y, &m, &d) != 3) {
		fprintf(stderr, "bad date: %s\n", s);
		exit(1);
	}
	return (int32_t)days_from_civil(y, (unsigned)m, (unsigned)d);
}

static void mkdirs(const std::string &path) {
	/* create path and any missing parents; error out if that fails */
	for (size_t i = 1; i <= path.size(); i++) {
		if (i == path.size() || path[i] == '/') {
			std::string p = path.substr(0, i);
			if (mkdir(p.c_str(), 0755) != 0 && errno != EEXIST) {
				perror(("mkdir " + p).c_str());
				exit(1);
			}
		}
	}
}

struct ColWriter {
	FILE *f = nullptr;
	FILE *bytes = nullptr;
	std::string name, kind;

	void open_num(const std::string &dir, const char *col, const char *k) {
		name = col;
		kind = k;
		std::string ext = (kind == "i32" || kind == "date") ? ".i32" : ".i64";
		f = fopen((dir + "/" + col + ext).c_str(), "wb");
		if (!f) { perror("fopen"); exit(1); }
	}
	void open_str(const std::string &dir, const char *col) {
		name = col;
		kind = "str";
		f = fopen((dir + "/" + col + ".len").c_str(), "wb");
		bytes = fopen((dir + "/" + col + ".bytes").c_str(), "wb");
		if (!f || !bytes) { perror("fopen"); exit(1); }
	}
	void put_i64(int64_t v) { fwrite(&v, 8, 1, f); }
	void put_i32(int32_t v) { fwrite(&v, 4, 1, f); }
	void put_date(const char *s) { put_i32(parse_date(s)); }
	void put_str(const char *s, int len) {
		uint32_t l = (uint32_t)len;
		fwrite(&l, 4, 1, f);
		fwrite(s, 1, l, bytes);
	}
	void put_strz(const char *s) { put_str(s, (int)strlen(s)); }
	void close() {
		if (f) fclose(f);
		if (bytes) fclose(bytes);
		f = bytes = nullptr;
	}
};

struct TableWriter {
	std::string dir;
	std::vector<ColWriter> cols;
	int64_t rows = 0;

	void open(const std::string &out, const char *table) {
		dir = out + "/" + table;
		mkdirs(dir);
		cols.reserve(24); // callers hold references; never reallocate
	}
	ColWriter &num(const char *col, const char *k) {
		cols.emplace_back();
		cols.back().open_num(dir, col, k);
		return cols.back();
	}
	ColWriter &str(const char *col) {
		cols.emplace_back();
		cols.back().open_str(dir, col);
		return cols.back();
	}
	void finish() {
		fprintf(stderr, "finish %s rows=%lld\n", dir.c_str(), (long long)rows);
		FILE *m = fopen((dir + "/meta.json").c_str(), "wb");
		fprintf(m, "{\"rows\": %lld, \"columns\": [", (long long)rows);
		for (size_t i = 0; i < cols.size(); i++) {
			fprintf(m, "%s{\"name\": \"%s\", \"kind\": \"%s\"}", i ? ", " : "",
			        cols[i].name.c_str(), cols[i].kind.c_str());
		}
		fprintf(m, "]}\n");
		fclose(m);
		for (auto &c : cols) c.close();
	}
};

// ---------------------------------------------------------------------------

int main(int argc, char **argv) {
	if (argc < 3) {
		fprintf(stderr, "usage: dbgen_tbl <scale> <outdir>\n");
		return 1;
	}
	fprintf(stderr, "start\n"); double flt_scale = atof(argv[1]);
	std::string out = argv[2];
	mkdirs(out);

	DBGenContext ctx;
	// globals the TPC core reads (normally set by the host program)
	table = (1 << CUST) | (1 << SUPP) | (1 << NATION) | (1 << REGION) |
	        (1 << PART_PSUPP) | (1 << ORDER_LINE);
	force = 0; verbose = 0; set_seeds = 0; updates = 0; d_path = NULL;
	insert_segments = delete_segments = 0;
	insert_orders_segment = insert_lineitem_segment = delete_segment = 0;

	// base cardinalities (reference: dbgen.cpp InitializeBaseContext)
	ctx.tdefs[PART].base = 200000;
	ctx.tdefs[PSUPP].base = 200000;
	ctx.tdefs[SUPP].base = 10000;
	ctx.tdefs[CUST].base = 150000;
	ctx.tdefs[ORDER].base = 150000 * ORDERS_PER_CUST;
	ctx.tdefs[LINE].base = 150000 * ORDERS_PER_CUST;
	ctx.tdefs[ORDER_LINE].base = 150000 * ORDERS_PER_CUST;
	ctx.tdefs[PART_PSUPP].base = 200000;
	ctx.tdefs[NATION].base = NATIONS_MAX;
	ctx.tdefs[REGION].base = NATIONS_MAX;

	if (flt_scale < MIN_SCALE) {
		int int_scale = (int)(1000 * flt_scale);
		ctx.scale_factor = 1;
		for (int i = PART; i < REGION; i++) {
			ctx.tdefs[i].base = (DSS_HUGE)(int_scale * ctx.tdefs[i].base) / 1000;
			if (ctx.tdefs[i].base < 1) ctx.tdefs[i].base = 1;
		}
	} else {
		ctx.scale_factor = (long)flt_scale;
	}

	load_dists(10 * 1024 * 1024, &ctx);
	ctx.tdefs[NATION].base = nations.count;
	ctx.tdefs[REGION].base = regions.count;

	// ---- region ----
	{
		TableWriter t; t.open(out, "region");
		auto &k = t.num("r_regionkey", "i32");
		auto &n = t.str("r_name");
		auto &c = t.str("r_comment");
		code_t row;
		for (DSS_HUGE i = 1; i <= ctx.tdefs[REGION].base; i++) {
			row_start(REGION, &ctx);
			mk_region(i, &row, &ctx);
			row_stop_h(REGION, &ctx);
			k.put_i32((int32_t)row.code);
			n.put_strz(row.text);
			c.put_str(row.comment, row.clen);
			t.rows++;
		}
		t.finish();
	}
	// ---- nation ----
	{
		TableWriter t; t.open(out, "nation");
		auto &k = t.num("n_nationkey", "i32");
		auto &n = t.str("n_name");
		auto &r = t.num("n_regionkey", "i32");
		auto &c = t.str("n_comment");
		code_t row;
		for (DSS_HUGE i = 1; i <= ctx.tdefs[NATION].base; i++) {
			row_start(NATION, &ctx);
			mk_nation(i, &row, &ctx);
			row_stop_h(NATION, &ctx);
			k.put_i32((int32_t)row.code);
			n.put_strz(row.text);
			r.put_i32((int32_t)row.join);
			c.put_str(row.comment, row.clen);
			t.rows++;
		}
		t.finish();
	}
	// ---- supplier ----
	{
		TableWriter t; t.open(out, "supplier");
		auto &k = t.num("s_suppkey", "i64");
		auto &n = t.str("s_name");
		auto &a = t.str("s_address");
		auto &nk = t.num("s_nationkey", "i32");
		auto &ph = t.str("s_phone");
		auto &ab = t.num("s_acctbal", "i64");
		auto &c = t.str("s_comment");
		supplier_t row;
		DSS_HUGE count = ctx.tdefs[SUPP].base * ctx.scale_factor;
		for (DSS_HUGE i = 1; i <= count; i++) {
			row_start(SUPP, &ctx);
			mk_supp(i, &row, &ctx);
			row_stop_h(SUPP, &ctx);
			k.put_i64(row.suppkey);
			n.put_strz(row.name);
			a.put_str(row.address, row.alen);
			nk.put_i32((int32_t)row.nation_code);
			ph.put_strz(row.phone);
			ab.put_i64(row.acctbal);
			c.put_str(row.comment, row.clen);
			t.rows++;
		}
		t.finish();
	}
	// ---- customer ----
	{
		TableWriter t; t.open(out, "customer");
		auto &k = t.num("c_custkey", "i64");
		auto &n = t.str("c_name");
		auto &a = t.str("c_address");
		auto &nk = t.num("c_nationkey", "i32");
		auto &ph = t.str("c_phone");
		auto &ab = t.num("c_acctbal", "i64");
		auto &ms = t.str("c_mktsegment");
		auto &c = t.str("c_comment");
		customer_t row;
		DSS_HUGE count = ctx.tdefs[CUST].base * ctx.scale_factor;
		for (DSS_HUGE i = 1; i <= count; i++) {
			row_start(CUST, &ctx);
			mk_cust(i, &row, &ctx);
			row_stop_h(CUST, &ctx);
			k.put_i64(row.custkey);
			n.put_strz(row.name);
			a.put_str(row.address, row.alen);
			nk.put_i32((int32_t)row.nation_code);
			ph.put_strz(row.phone);
			ab.put_i64(row.acctbal);
			ms.put_strz(row.mktsegment);
			c.put_str(row.comment, row.clen);
			t.rows++;
		}
		t.finish();
	}
	// ---- part + partsupp ----
	{
		TableWriter tp; tp.open(out, "part");
		auto &pk = tp.num("p_partkey", "i64");
		auto &pn = tp.str("p_name");
		auto &pm = tp.str("p_mfgr");
		auto &pb = tp.str("p_brand");
		auto &pt = tp.str("p_type");
		auto &psz = tp.num("p_size", "i32");
		auto &pc = tp.str("p_container");
		auto &pr = tp.num("p_retailprice", "i64");
		auto &pcm = tp.str("p_comment");

		TableWriter ts; ts.open(out, "partsupp");
		auto &sk1 = ts.num("ps_partkey", "i64");
		auto &sk2 = ts.num("ps_suppkey", "i64");
		auto &sq = ts.num("ps_availqty", "i32");
		auto &sc = ts.num("ps_supplycost", "i64");
		auto &scm = ts.str("ps_comment");

		part_t row;
		DSS_HUGE count = ctx.tdefs[PART].base * ctx.scale_factor;
		for (DSS_HUGE i = 1; i <= count; i++) {
			row_start(PART, &ctx);
			mk_part(i, &row, &ctx);
			row_stop_h(PART, &ctx);
			pk.put_i64(row.partkey);
			pn.put_str(row.name, row.nlen);
			pm.put_strz(row.mfgr);
			pb.put_strz(row.brand);
			pt.put_str(row.type, row.tlen);
			psz.put_i32((int32_t)row.size);
			pc.put_strz(row.container);
			pr.put_i64(row.retailprice);
			pcm.put_str(row.comment, row.clen);
			tp.rows++;
			for (long s = 0; s < SUPP_PER_PART; s++) {
				sk1.put_i64(row.s[s].partkey);
				sk2.put_i64(row.s[s].suppkey);
				sq.put_i32((int32_t)row.s[s].qty);
				sc.put_i64(row.s[s].scost);
				scm.put_str(row.s[s].comment, row.s[s].clen);
				ts.rows++;
			}
		}
		tp.finish();
		ts.finish();
	}
	// ---- orders + lineitem ----
	{
		TableWriter to; to.open(out, "orders");
		auto &ok = to.num("o_orderkey", "i64");
		auto &ck = to.num("o_custkey", "i64");
		auto &st = to.str("o_orderstatus");
		auto &tp_ = to.num("o_totalprice", "i64");
		auto &od = to.num("o_orderdate", "date");
		auto &op = to.str("o_orderpriority");
		auto &cl = to.str("o_clerk");
		auto &sp = to.num("o_shippriority", "i32");
		auto &oc = to.str("o_comment");

		TableWriter tl; tl.open(out, "lineitem");
		auto &lok = tl.num("l_orderkey", "i64");
		auto &lpk = tl.num("l_partkey", "i64");
		auto &lsk = tl.num("l_suppkey", "i64");
		auto &lln = tl.num("l_linenumber", "i32");
		auto &lq = tl.num("l_quantity", "i64");
		auto &lep = tl.num("l_extendedprice", "i64");
		auto &ld = tl.num("l_discount", "i64");
		auto &lt = tl.num("l_tax", "i64");
		auto &lrf = tl.str("l_returnflag");
		auto &lls = tl.str("l_linestatus");
		auto &lsd = tl.num("l_shipdate", "date");
		auto &lcd = tl.num("l_commitdate", "date");
		auto &lrd = tl.num("l_receiptdate", "date");
		auto &lsi = tl.str("l_shipinstruct");
		auto &lsm = tl.str("l_shipmode");
		auto &lcm = tl.str("l_comment");

		order_t row;
		DSS_HUGE count = ctx.tdefs[ORDER].base * ctx.scale_factor;
		for (DSS_HUGE i = 1; i <= count; i++) {
			row_start(ORDER_LINE, &ctx);
			mk_order(i, &row, &ctx, 0);
			row_stop_h(ORDER_LINE, &ctx);
			ok.put_i64(row.okey);
			ck.put_i64(row.custkey);
			st.put_str(&row.orderstatus, 1);
			tp_.put_i64(row.totalprice);
			od.put_date(row.odate);
			op.put_strz(row.opriority);
			cl.put_strz(row.clerk);
			sp.put_i32((int32_t)row.spriority);
			oc.put_str(row.comment, row.clen);
			to.rows++;
			for (DSS_HUGE l = 0; l < row.lines; l++) {
				line_t &li = row.l[l];
				lok.put_i64(li.okey);
				lpk.put_i64(li.partkey);
				lsk.put_i64(li.suppkey);
				lln.put_i32((int32_t)li.lcnt);
				lq.put_i64(li.quantity);
				lep.put_i64(li.eprice);
				ld.put_i64(li.discount);
				lt.put_i64(li.tax);
				lrf.put_str(li.rflag, 1);
				lls.put_str(li.lstatus, 1);
				lsd.put_date(li.sdate);
				lcd.put_date(li.cdate);
				lrd.put_date(li.rdate);
				lsi.put_strz(li.shipinstruct);
				lsm.put_strz(li.shipmode);
				lcm.put_str(li.comment, li.clen);
				tl.rows++;
			}
		}
		to.finish();
		tl.finish();
	}

	cleanup_dists();
	fprintf(stderr, "dbgen_tbl: wrote scale %g to %s\n", flt_scale, out.c_str());
	return 0;
}
