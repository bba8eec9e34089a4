"""Interactive SQL shell: `python -m duckdb_tpu.cli [database]`.

Parity with the reference shell (/root/reference/tools/shell/shell.cpp):
line editing (readline), multi-line statements terminated by ';',
dot-commands, output modes, timing.
"""

from __future__ import annotations

import sys
import time

import duckdb_tpu
from duckdb_tpu.cli.render import RENDERERS


HELP = """\
.help              show this help
.tables            list tables
.schema [table]    show CREATE statements / column types
.mode MODE         output mode: box csv json list
.timer on|off      toggle per-query timing
.read FILE         execute SQL from a file
.open FILE         open a database directory
.databases         list attached databases
.maxrows N         rows shown in box mode
.exit / .quit      leave the shell
"""


class Shell:
    def __init__(self, database=":memory:"):
        self.con = duckdb_tpu.connect(database)
        self.mode = "box"
        self.timer = False
        self.max_rows = 40
        self.database = database

    # -- dot commands --------------------------------------------------------
    def dot(self, line: str) -> bool:
        parts = line.split()
        cmd = parts[0][1:].lower()
        args = parts[1:]
        if cmd in ("exit", "quit", "q"):
            return False
        if cmd == "help":
            print(HELP)
        elif cmd == "tables":
            for t in sorted(self.con.catalog.tables):
                print(t)
            for v in sorted(self.con.catalog.views):
                print(f"{v} (view)")
        elif cmd == "schema":
            names = args or sorted(self.con.catalog.tables)
            for t in names:
                if not self.con.catalog.has_table(t):
                    print(f"-- no such table: {t}")
                    continue
                e = self.con.catalog.get_table(t)
                cols = ",\n".join(f"  {c.name} {c.ltype}" for c in e.columns)
                print(f"CREATE TABLE {t} (\n{cols}\n);")
        elif cmd == "mode":
            if args and args[0] in RENDERERS:
                self.mode = args[0]
            else:
                print(f"modes: {', '.join(sorted(set(RENDERERS)))}")
        elif cmd == "timer":
            self.timer = bool(args) and args[0].lower() == "on"
        elif cmd == "maxrows":
            self.max_rows = int(args[0]) if args else 40
        elif cmd == "read":
            with open(args[0]) as f:
                self.run_sql(f.read())
        elif cmd == "open":
            self.con = duckdb_tpu.connect(args[0])
            self.database = args[0]
        elif cmd == "databases":
            print(self.database)
        else:
            print(f'unknown command "{line}". Try .help')
        return True

    # -- SQL -----------------------------------------------------------------
    def run_sql(self, sql: str):
        t0 = time.perf_counter()
        try:
            res = self.con.sql(sql)
        except Exception as e:  # noqa: BLE001 — surface engine errors to user
            print(f"Error: {e}")
            return
        dt = time.perf_counter() - t0
        if res is not None and not getattr(res, "_dml_count", False):
            renderer = RENDERERS[self.mode]
            if self.mode == "box":
                print(renderer(res.names, res.rows(), self.max_rows))
            else:
                print(renderer(res.names, res.rows()))
        if self.timer:
            print(f"Run Time: {dt:.3f}s")

    def repl(self):
        try:
            import readline  # noqa: F401  (line editing side effect)
        except ImportError:
            pass
        print(f"duckdb_tpu {duckdb_tpu.__version__} — TPU-native SQL engine")
        print('Enter ".help" for usage hints.')
        buf = []
        while True:
            prompt = "D " if not buf else "· "
            try:
                line = input(prompt)
            except EOFError:
                print()
                break
            except KeyboardInterrupt:
                buf = []
                print()
                continue
            if not buf and line.strip().startswith("."):
                if not self.dot(line.strip()):
                    break
                continue
            buf.append(line)
            if line.rstrip().endswith(";"):
                sql = "\n".join(buf)
                buf = []
                self.run_sql(sql)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    db = ":memory:"
    run_cmds = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-c":
            i += 1
            run_cmds.append(argv[i])
        elif a in ("-csv", "-json", "-list", "-box"):
            run_cmds.insert(0, ".mode " + a[1:])
        elif not a.startswith("-"):
            db = a
        i += 1
    sh = Shell(db)
    if run_cmds:
        for c in run_cmds:
            if c.strip().startswith("."):
                sh.dot(c.strip())
            else:
                sh.run_sql(c)
        return 0
    sh.repl()
    return 0


if __name__ == "__main__":
    sys.exit(main())
