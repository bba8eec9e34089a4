"""Multi-file scans: globs, union_by_name, hive partitioning, filename.

Reference analog: /root/reference/src/common/multi_file/ and
test/sql/copy/csv + test/sql/copy/parquet multi-file coverage.
"""

import os

import pytest


@pytest.fixture()
def con():
    import duckdb_tpu

    return duckdb_tpu.connect()


@pytest.fixture()
def csv_dir(tmp_path):
    d = tmp_path / "csvs"
    d.mkdir()
    (d / "a.csv").write_text("id,v\n1,x\n2,y\n")
    (d / "b.csv").write_text("id,v\n3,z\n")
    return str(d)


def test_glob_csv(con, csv_dir):
    rows = con.sql(
        f"SELECT id, v FROM read_csv('{csv_dir}/*.csv') ORDER BY id").rows()
    assert rows == [(1, "x"), (2, "y"), (3, "z")]


def test_glob_replacement_scan(con, csv_dir):
    rows = con.sql(f"SELECT count(*) FROM '{csv_dir}/*.csv'").rows()
    assert rows == [(3,)]


def test_filename_column(con, csv_dir):
    rows = con.sql(
        f"SELECT id, filename FROM read_csv('{csv_dir}/*.csv', "
        "filename=true) ORDER BY id").rows()
    assert [r[0] for r in rows] == [1, 2, 3]
    assert rows[0][1].endswith("a.csv")
    assert rows[2][1].endswith("b.csv")


def test_union_by_name(con, tmp_path):
    d = tmp_path / "u"
    d.mkdir()
    (d / "a.csv").write_text("id,x\n1,10\n")
    (d / "b.csv").write_text("id,y\n2,hello\n")
    rows = con.sql(
        f"SELECT id, x, y FROM read_csv('{d}/*.csv', union_by_name=true)"
        " ORDER BY id").rows()
    assert rows == [(1, 10, None), (2, None, "hello")]


def test_schema_mismatch_errors(con, tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    (d / "a.csv").write_text("id,x\n1,10\n")
    (d / "b.csv").write_text("id,y\n2,20\n")
    with pytest.raises(Exception, match="union_by_name"):
        con.sql(f"SELECT * FROM read_csv('{d}/*.csv')").rows()


def test_hive_partitioning(con, tmp_path):
    base = tmp_path / "hive"
    for year, month, vals in [(2023, 1, [1, 2]), (2023, 2, [3]),
                              (2024, 1, [4, 5, 6])]:
        d = base / f"year={year}" / f"month={month}"
        d.mkdir(parents=True)
        (d / "part.csv").write_text(
            "v\n" + "\n".join(str(v) for v in vals) + "\n")
    pat = f"{base}/**/*.csv"
    rows = con.sql(
        f"SELECT year, month, sum(v) FROM read_csv('{pat}',"
        " hive_partitioning=1) GROUP BY year, month"
        " ORDER BY year, month").rows()
    assert rows == [(2023, 1, 3), (2023, 2, 3), (2024, 1, 15)]
    # partition pruning predicate
    rows = con.sql(
        f"SELECT sum(v) FROM read_csv('{pat}', hive_partitioning=1)"
        " WHERE year = 2024").rows()
    assert rows == [(15,)]


def test_hive_auto_detection(con, tmp_path):
    base = tmp_path / "auto"
    d = base / "region=eu"
    d.mkdir(parents=True)
    (d / "x.csv").write_text("v\n7\n")
    d2 = base / "region=us"
    d2.mkdir(parents=True)
    (d2 / "x.csv").write_text("v\n8\n")
    rows = con.sql(
        f"SELECT region, v FROM read_csv('{base}/**/*.csv')"
        " ORDER BY region").rows()
    assert rows == [("eu", 7), ("us", 8)]


def test_multi_parquet(con, tmp_path):
    import duckdb_tpu

    w = duckdb_tpu.connect()
    w.sql(f"COPY (SELECT range AS i, range * 2 AS d FROM range(5))"
          f" TO '{tmp_path}/p1.parquet' (FORMAT PARQUET)")
    w.sql(f"COPY (SELECT range + 5 AS i, range AS d FROM range(3))"
          f" TO '{tmp_path}/p2.parquet' (FORMAT PARQUET)")
    rows = con.sql(
        f"SELECT count(*), sum(i) FROM read_parquet('{tmp_path}/*.parquet')"
    ).rows()
    assert rows == [(8, 28)]


def test_list_of_paths(con, csv_dir):
    rows = con.sql(
        f"SELECT count(*) FROM read_csv(['{csv_dir}/a.csv',"
        f" '{csv_dir}/b.csv'])").rows()
    assert rows == [(3,)]


def test_no_files_error(con):
    with pytest.raises(Exception, match="[Nn]o files"):
        con.sql("SELECT * FROM read_csv('/nonexistent/dir/*.csv')").rows()


def test_hive_explicit_mismatch_errors(con, csv_dir):
    # explicit hive_partitioning=true with no key=value segments: error,
    # not a silent no-op (advisor round-3 finding)
    with pytest.raises(Exception, match="hive_partitioning"):
        con.sql(f"SELECT * FROM read_csv('{csv_dir}/*.csv',"
                " hive_partitioning=1)").rows()


def test_hive_single_file_auto_detect(con, tmp_path):
    d = tmp_path / "single" / "year=2024"
    d.mkdir(parents=True)
    (d / "x.csv").write_text("v\n9\n")
    rows = con.sql(
        f"SELECT year, v FROM read_csv('{d}/x.csv')").rows()
    assert rows == [(2024, 9)]
    # literal single-path replacement scan detects it too
    rows = con.sql(f"SELECT year, v FROM '{d}/x.csv'").rows()
    assert rows == [(2024, 9)]


def test_unknown_named_parameter_errors(con, csv_dir):
    with pytest.raises(Exception, match="union_by_names"):
        con.sql(f"SELECT * FROM read_csv('{csv_dir}/a.csv',"
                " union_by_names=true)").rows()
