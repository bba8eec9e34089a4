"""Relation API: lazy, composable query building.

Parity target: the reference's Relation API
(/root/reference/src/include/duckdb/main/relation.hpp:59, 27 relation
types under src/main/relation/). Relations compose SQL text lazily and
plan/execute on materialization — the same contract, built over the SQL
frontend rather than bound expression trees.
"""

from __future__ import annotations

from typing import List, Optional


class RawSQL:
    """Parameter wrapper whose text substitutes verbatim (INTERVAL
    literals from the C API's duckdb_bind_interval)."""

    def __init__(self, sql: str):
        self.sql = sql


class Relation:
    def __init__(self, con, sql: str, alias: str = "rel"):
        self._con = con
        self._sql = sql
        self.alias = alias

    # -- composition ---------------------------------------------------------
    def _wrap(self, select="*", where=None, group=None, having=None,
              order=None, limit=None, alias=None):
        q = f"SELECT {select} FROM ({self._sql}) AS {self.alias}"
        if where:
            q += f" WHERE {where}"
        if group:
            q += f" GROUP BY {group}"
        if having:
            q += f" HAVING {having}"
        if order:
            q += f" ORDER BY {order}"
        if limit is not None:
            q += f" LIMIT {limit}"
        return Relation(self._con, q, alias or self.alias)

    def filter(self, condition: str) -> "Relation":
        return self._wrap(where=condition)

    def project(self, *exprs: str) -> "Relation":
        return self._wrap(select=", ".join(exprs))

    select = project

    def aggregate(self, aggr: str, group_expr: str = "") -> "Relation":
        if group_expr:
            return self._wrap(select=f"{group_expr}, {aggr}", group=group_expr)
        return self._wrap(select=aggr)

    def order(self, order_expr: str) -> "Relation":
        return self._wrap(order=order_expr)

    sort = order

    def limit(self, n: int, offset: int = 0) -> "Relation":
        off = f" OFFSET {offset}" if offset else ""
        return Relation(self._con,
                        f"SELECT * FROM ({self._sql}) AS {self.alias} "
                        f"LIMIT {n}{off}", self.alias)

    def join(self, other: "Relation", condition: str,
             how: str = "inner") -> "Relation":
        jt = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
              "semi": "SEMI JOIN", "anti": "ANTI JOIN"}[how]
        q = (f"SELECT * FROM ({self._sql}) AS {self.alias} {jt} "
             f"({other._sql}) AS {other.alias} ON {condition}")
        return Relation(self._con, q, self.alias)

    def union(self, other: "Relation") -> "Relation":
        return Relation(self._con, f"({self._sql}) UNION ALL ({other._sql})",
                        self.alias)

    def except_(self, other: "Relation") -> "Relation":
        return Relation(self._con, f"({self._sql}) EXCEPT ({other._sql})",
                        self.alias)

    def intersect(self, other: "Relation") -> "Relation":
        return Relation(self._con, f"({self._sql}) INTERSECT ({other._sql})",
                        self.alias)

    def distinct(self) -> "Relation":
        return Relation(self._con,
                        f"SELECT DISTINCT * FROM ({self._sql}) AS "
                        f"{self.alias}", self.alias)

    def set_alias(self, alias: str) -> "Relation":
        return Relation(self._con, self._sql, alias)

    # -- materialization ------------------------------------------------------
    def execute(self):
        return self._con.sql(self._sql)

    def fetchall(self):
        return self.execute().rows()

    def fetchone(self):
        rows = self.execute().rows()
        return rows[0] if rows else None

    def df(self):
        """Materialize as a pandas DataFrame."""
        import pandas as pd

        res = self.execute()
        return pd.DataFrame(res.rows(), columns=res.names)

    def count(self) -> int:
        return self.aggregate("count(*) AS cnt").fetchone()[0]

    def create(self, table_name: str):
        self._con.sql(f"CREATE TABLE {table_name} AS {self._sql}")

    def create_view(self, view_name: str):
        self._con.sql(f"CREATE VIEW {view_name} AS {self._sql}")

    def to_csv(self, path: str):
        self._con.sql(f"COPY ({self._sql}) TO '{path}'")

    def to_parquet(self, path: str):
        self._con.sql(f"COPY ({self._sql}) TO '{path}' (FORMAT PARQUET)")

    @property
    def columns(self) -> List[str]:
        return self.execute().names

    def explain(self) -> str:
        res = self._con.sql(f"EXPLAIN {self._sql}")
        return res.rows()[0][0]

    def __repr__(self):
        res = self._con.sql(f"SELECT * FROM ({self._sql}) AS r LIMIT 5")
        from duckdb_tpu.cli.render import render_box

        return render_box(res.names, res.rows())


class PreparedStatement:
    """Parameterized statement: `?` placeholders bound per execution
    (reference: src/main/prepared_statement.cpp)."""

    def __init__(self, con, sql: str):
        self._con = con
        self._sql = sql

    def _param_tokens(self):
        # token-level placeholder scan: the lexer skips string literals
        # and comments, so `'cost ?'` stays data (same rule as EXECUTE,
        # api/connection.py)
        from duckdb_tpu.sql.lexer import tokenize as _tok

        return [t for t in _tok(self._sql)
                if t.type == "OP"
                and (t.value == "?"
                     or (t.value.startswith("$") and t.value[1:].isdigit()))]

    @property
    def nparams(self) -> int:
        toks = self._param_tokens()
        return (sum(1 for t in toks if t.value == "?")
                or max((int(t.value[1:]) for t in toks if t.value != "?"),
                       default=0))

    def execute(self, *params):
        def render(p):
            import datetime as _dt

            if p is None:
                return "NULL"
            if isinstance(p, bool):
                return "true" if p else "false"
            if isinstance(p, str):
                return "'" + p.replace("'", "''") + "'"
            if isinstance(p, _dt.datetime):
                return f"TIMESTAMP '{p}'"
            if isinstance(p, _dt.date):
                return f"DATE '{p}'"
            if isinstance(p, _dt.time):
                return f"TIME '{p}'"
            if isinstance(p, (bytes, bytearray)):
                return ("'" + "".join(f"\\x{b:02X}" for b in p)
                        + "'::BLOB")
            if isinstance(p, RawSQL):
                return p.sql
            return str(p)

        sql = self._sql
        pieces, last, i = [], 0, 0
        for t in self._param_tokens():
            if t.value == "?":
                v = params[i] if i < len(params) else None
                i += 1
            else:
                n = int(t.value[1:]) - 1
                v = params[n] if n < len(params) else None
            pieces.append(sql[last:t.pos])
            pieces.append(render(v))
            last = t.pos + len(t.value)
        pieces.append(sql[last:])
        return self._con.sql("".join(pieces))
