"""CLI shell end-to-end via subprocess."""

import os
import subprocess
import sys

import pytest

ENV = {**os.environ, "JAX_PLATFORMS": "cpu",
       "PYTHONPATH": os.path.join(os.path.dirname(__file__), "..")}


def run_cli(*args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "duckdb_tpu.cli", *args],
        capture_output=True, text=True, input=stdin, env=ENV, timeout=120,
        cwd=os.path.join(os.path.dirname(__file__), ".."))


def test_cli_commands():
    r = run_cli("-c", "CREATE TABLE t (a INT, b VARCHAR);",
                "-c", "INSERT INTO t VALUES (1,'x'),(2,'y');",
                "-c", "SELECT sum(a) AS s FROM t;")
    assert r.returncode == 0, r.stderr
    assert "3" in r.stdout
    assert "s" in r.stdout  # header rendered


def test_cli_csv_mode():
    r = run_cli("-csv",
                "-c", "SELECT 1 AS a, 'hi' AS b UNION ALL SELECT 2, 'yo' ORDER BY a;")
    assert r.returncode == 0, r.stderr
    assert "a,b" in r.stdout
    assert "1,hi" in r.stdout


def test_cli_repl_pipe():
    script = (".mode list\n"
              "CREATE TABLE t (x INT);\n"
              "INSERT INTO t VALUES (5);\n"
              "SELECT x * 2 AS d FROM t;\n"
              ".tables\n"
              ".quit\n")
    r = run_cli(stdin=script)
    assert r.returncode == 0, r.stderr
    assert "10" in r.stdout
    assert "t" in r.stdout


def test_cli_error_handling():
    r = run_cli("-c", "SELECT nope FROM nothing;")
    assert r.returncode == 0  # errors print, shell continues
    assert "Error" in r.stdout or "Error" in r.stderr
