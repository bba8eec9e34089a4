"""Appender bulk ingest."""


def test_appender_bulk():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a INT, b VARCHAR, c DECIMAL(10,2))")
    with con.appender("t") as app:
        for i in range(5000):
            app.append_row(i, f"s{i % 100}", i * 0.25)
    assert con.sql(
        "SELECT count(*), sum(a), count(DISTINCT b) FROM t").rows() == \
        [(5000, 12497500, 100)]
    import decimal

    assert con.sql("SELECT c FROM t WHERE a = 7").rows() == \
        [(decimal.Decimal("1.75"),)]


def test_appender_nulls_and_incremental():
    import duckdb_tpu

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t (a INT, b VARCHAR)")
    app = con.appender("t")
    app.append_row(1, "x")
    app.append_row(None, None)
    app.flush()
    app.append_row(3, "y")
    app.close()
    rows = con.sql("SELECT * FROM t ORDER BY a NULLS LAST").rows()
    assert rows == [(1, "x"), (3, "y"), (None, None)]
