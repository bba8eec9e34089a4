"""Relation API: lazy, composable query building.

Parity target: the reference's Relation API
(/root/reference/src/include/duckdb/main/relation.hpp:59, 27 relation
types under src/main/relation/). Relations compose SQL text lazily and
plan/execute on materialization — the same contract, built over the SQL
frontend rather than bound expression trees.
"""

from __future__ import annotations

from typing import List, Optional


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

    def execute(self, *params):
        sql = self._sql
        for p in params:
            if p is None:
                lit = "NULL"
            elif isinstance(p, str):
                lit = "'" + p.replace("'", "''") + "'"
            elif isinstance(p, bool):
                lit = "true" if p else "false"
            else:
                lit = str(p)
            sql = sql.replace("?", lit, 1)
        return self._con.sql(sql)
