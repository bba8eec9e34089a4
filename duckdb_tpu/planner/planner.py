"""Statement planner: parsed AST → plan tree.

Covers the reference's Binder + subquery flattening + (a first slice of)
the optimizer (/root/reference/src/planner/binder.cpp,
src/planner/subquery/, src/optimizer/):

- FROM trees flatten into an atom pool; WHERE conjuncts classify into
  per-atom pushed filters, equi-join edges, and deferred predicates
  (filter pushdown for free).
- Join order: greedy — largest atom is the probe spine, smallest
  connected atom joins next as build side (the spirit of the reference's
  join-order optimizer's greedy fallback, src/optimizer/join_order/).
- Subqueries are flattened relationally, like duckdb's FlattenDependentJoins:
  EXISTS/IN → semi/anti joins; correlated scalar aggregates → grouped
  aggregate atom + equi-join on the correlation keys; uncorrelated scalar
  subqueries → lazily-executed scalar constants.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

import jax.numpy as jnp
import numpy as np

from duckdb_tpu.sql import nodes as N
from duckdb_tpu.planner import bound as B
from duckdb_tpu.planner import plan as P
from duckdb_tpu.planner.binder import (
    AGGREGATE_NAMES,
    BindError,
    ExprBinder,
    Scope,
    resolve_type_name,
)
from duckdb_tpu.types import (
    BIGINT,
    BOOLEAN,
    DOUBLE,
    VARCHAR,
    LogicalType,
    SQLNULL,
    TypeId,
    decimal,
    max_logical_type,
)


def split_conjuncts(e: Optional[N.Expr]) -> List[N.Expr]:
    if e is None:
        return []
    if isinstance(e, N.Conjunction) and e.op == "and":
        out = []
        for c in e.children:
            out.extend(split_conjuncts(c))
        return out
    return [e]


def hoist_or_common(ast: N.Expr) -> List[N.Expr]:
    """OR(A∧X, A∧Y) → [A, OR(X, Y)] — exposes join edges hidden inside OR
    branches (Q19 shape; the reference's filter-combiner does the same,
    src/optimizer/filter_combiner.cpp)."""
    if not (isinstance(ast, N.Conjunction) and ast.op == "or"):
        return [ast]
    branch_lists = [split_conjuncts(b) for b in ast.children]
    common = [c for c in branch_lists[0]
              if all(any(c == d for d in bl) for bl in branch_lists[1:])]
    implied = _implied_in_filters(branch_lists)
    if not common:
        return implied + [ast]
    rest_branches = []
    for bl in branch_lists:
        rest = [c for c in bl if not any(c == d for d in common)]
        if not rest:
            return common  # one branch is exactly the common set → OR is implied
        rest_branches.append(rest[0] if len(rest) == 1
                             else N.Conjunction("and", rest))
    return implied + common + [N.Conjunction("or", rest_branches)]


def _implied_in_filters(branch_lists) -> List[N.Expr]:
    """Derive redundant single-column filters implied by an OR of
    conjunctions: if EVERY branch pins column c to a literal (c = v, or
    c IN (vs)), then `c IN (union of values)` holds whenever the OR does.
    The derived filter pushes into c's atom — turning the q07 nation-pair
    OR into restrictive dimension builds — while the original OR stays
    for exactness (reference filter_combiner derives the same class)."""
    def eq_map(conj):
        out = {}
        for c in conj:
            if (isinstance(c, N.BinaryOp) and c.op == "="
                    and isinstance(c.left, N.ColumnRef)
                    and isinstance(c.right, N.Literal)):
                ref, vals = c.left, [c.right]
            elif (isinstance(c, N.BinaryOp) and c.op == "="
                    and isinstance(c.right, N.ColumnRef)
                    and isinstance(c.left, N.Literal)):
                ref, vals = c.right, [c.left]
            elif (isinstance(c, N.InList) and not c.negated
                    and isinstance(c.expr, N.ColumnRef)
                    and all(isinstance(i, N.Literal) for i in c.items)):
                ref, vals = c.expr, list(c.items)
            else:
                continue
            key = tuple(p.lower() for p in ref.parts)
            out.setdefault(key, (ref, []))[1].extend(vals)
        return out
    maps = [eq_map(bl) for bl in branch_lists]
    derived = []
    for colkey, (ref, vals) in maps[0].items():
        seen, items = set(), []
        for m in maps:
            if colkey not in m:
                items = None
                break
            for v in m[colkey][1]:
                if repr(v.value) not in seen:
                    seen.add(repr(v.value))
                    items.append(v)
        if items:
            derived.append(N.InList(ref, items) if len(items) > 1
                           else N.BinaryOp("=", ref, items[0]))
    return derived


@dataclass
class BoundScalarSubquery(B.BoundExpr):
    """Uncorrelated scalar subquery: executed once, on first eval."""

    planner: "Planner"
    plan: P.PlanNode
    out_key: str
    ltype: LogicalType

    def eval(self, env):
        v = self.const_value()
        return B.BoundLiteral(v, self.ltype).eval(env)

    def is_const(self):
        return True

    def const_value(self):
        if not hasattr(self, "_value"):
            from duckdb_tpu.execution.executor import Executor

            ex = Executor(self.planner.catalog)
            res = ex.run(self.plan, [("v", self.out_key, self.ltype)])
            if res.nrows == 0:
                self._value = None
            else:
                vals, valid, dvals = res.columns[0]
                if valid is not None and not valid[0]:
                    self._value = None
                elif self.ltype.id is TypeId.VARCHAR:
                    self._value = str(dvals[vals[0]])
                elif self.ltype.is_float:
                    self._value = float(vals[0])
                else:
                    self._value = int(vals[0])
        return self._value


class BoundMarkSubquery(B.BoundExpr):
    """MARK join as an expression: `x IN (subquery)` / `EXISTS (subquery)`
    in ANY expression position (SELECT list, CASE, arithmetic), not just
    WHERE conjuncts the flattener rewrites to semi/anti joins.

    Reference: MARK joins in join_hashtable.cpp ScanKeyMatches — the mark
    column is TRUE on a match, FALSE on no match against a NULL-free build,
    NULL when unmatched against a build containing NULLs or when the probe
    key is NULL (and the build is non-empty). Uncorrelated only: the build
    executes once on first eval; the membership test runs on device."""

    def __init__(self, planner, expr: Optional[B.BoundExpr], plan, out_key,
                 out_type, negated: bool, exists_semantics: bool = False):
        self.planner = planner
        self.expr = expr  # None = EXISTS (pure emptiness test)
        self.plan = plan
        self.out_key = out_key
        self.out_type = out_type
        self.negated = negated
        # correlated EXISTS rewritten as membership: two-valued (a NULL
        # probe or build NULLs can never satisfy the correlation equality)
        self.exists_semantics = exists_semantics
        self.ltype = BOOLEAN

    def children(self):
        return [self.expr] if self.expr is not None else []

    def _build(self):
        if not hasattr(self, "_vals"):
            from duckdb_tpu.execution.executor import Executor

            ex = Executor(self.planner.catalog)
            res = ex.run(self.plan, [("v", self.out_key, self.out_type)])
            vals, valid, dvals = (res.columns[0] if res.columns
                                  else (np.empty(0), None, None))
            vals = np.asarray(vals)[:res.nrows]
            live_valid = (np.asarray(valid)[:res.nrows]
                          if valid is not None else None)
            has_null = bool(live_valid is not None and not live_valid.all())
            if live_valid is not None:
                vals = vals[live_valid]
            self._vals = vals
            self._dvals = dvals
            self._has_null = has_null
            self._empty = res.nrows == 0
        return self._vals, self._dvals, self._has_null, self._empty

    def eval(self, env):
        import jax
        import jax.numpy as jnp

        # the subplan executes through the ordinary (host-driving) executor;
        # under tracing that would leak tracers into scan caches — raise the
        # concretization error the fused pipelines catch to fall back to
        # eager execution, where this eval re-runs safely
        probe = (env.live if self.expr is None
                 else self.expr.eval(env).data)
        if isinstance(probe, jax.core.Tracer):
            raise jax.errors.ConcretizationTypeError(
                probe, "MARK subquery executes its build host-side")

        vals, dvals, has_null, empty = self._build()
        if self.expr is None:  # EXISTS
            r = (not empty) != self.negated
            return B.Column(data=jnp.full((env.plen,), r, jnp.bool_),
                            ltype=BOOLEAN)
        c = self.expr.eval(env)
        x = jnp.broadcast_to(c.data, (env.plen,))
        if c.ltype.id is TypeId.VARCHAR:
            # compare through the probe dictionary: membership of each
            # distinct probe string in the build's string set
            probe_d = c.dict_values if c.dict_values is not None else np.empty(0, object)
            bset = (set() if dvals is None or len(vals) == 0
                    else set(np.asarray(dvals)[vals].astype(str).tolist()))
            lut = np.fromiter((str(s) in bset for s in probe_d),
                              dtype=np.bool_, count=len(probe_d))
            match = jnp.asarray(lut)[jnp.clip(x, 0, max(len(probe_d) - 1, 0))]
        elif c.ltype.is_float or self.out_type.is_float:
            s1 = c.ltype.scale if c.ltype.id is TypeId.DECIMAL else 0
            s2 = (self.out_type.scale
                  if self.out_type.id is TypeId.DECIMAL else 0)
            xf = x.astype(jnp.float64) / (10.0 ** s1)
            bv = np.unique(vals.astype(np.float64) / (10.0 ** s2))
            match = (jnp.isin(xf, jnp.asarray(bv)) if len(bv)
                     else jnp.zeros((env.plen,), jnp.bool_))
        else:
            # integer families: rescale DECIMALs to the common scale (exact)
            s1 = c.ltype.scale if c.ltype.id is TypeId.DECIMAL else 0
            s2 = (self.out_type.scale
                  if self.out_type.id is TypeId.DECIMAL else 0)
            smax = max(s1, s2)
            xi = x.astype(jnp.int64) * jnp.int64(10 ** (smax - s1))
            bv = np.unique(vals.astype(np.int64) * 10 ** (smax - s2))
            match = (jnp.isin(xi, jnp.asarray(bv)) if len(bv)
                     else jnp.zeros((env.plen,), jnp.bool_))
        if self.exists_semantics:
            # EXISTS-as-membership is two-valued: NULL probes don't match
            if c.validity is not None:
                match = jnp.logical_and(
                    match, jnp.broadcast_to(c.validity, (env.plen,)))
            return B.Column(data=jnp.logical_xor(match, self.negated),
                            ltype=BOOLEAN)
        x_null = (jnp.logical_not(jnp.broadcast_to(c.validity, (env.plen,)))
                  if c.validity is not None
                  else jnp.zeros((env.plen,), jnp.bool_))
        if empty and not (len(vals) or has_null):
            # IN over an empty set: FALSE for every row, even NULL probes
            data = jnp.full((env.plen,), self.negated, jnp.bool_)
            return B.Column(data=data, ltype=BOOLEAN)
        unknown = jnp.logical_and(jnp.logical_not(match),
                                  jnp.logical_or(x_null, has_null))
        data = jnp.logical_xor(match, self.negated)
        return B.Column(data=data, ltype=BOOLEAN,
                        validity=jnp.logical_not(unknown))

    def is_const(self):
        return False


@dataclass
class Atom:
    id: int
    plan: P.PlanNode
    rows: int  # cardinality estimate (table rows; post-filter unknown)
    keys: Set[str]  # binding keys this atom provides
    # key → (catalog table, column) for base-scan atoms; drives the
    # fanout estimate in the greedy join order (PK edge ⇒ fanout 1)
    col_of: Dict[str, Tuple[str, str]] = field(default_factory=dict)
    # UNFILTERED base-table rows: pushed filters scale `rows` down, but
    # probe-spine orientation must follow the base table size (a filtered
    # fact side as BUILD = duplicate keys = no fused pipeline)
    base_rows: int = 0

    def __post_init__(self):
        if not self.base_rows:
            self.base_rows = self.rows


@dataclass
class SemiSpec:
    jtype: str  # semi | anti
    build_plan: P.PlanNode
    probe_keys: List[B.BoundExpr]  # over outer columns
    build_keys: List[B.BoundExpr]  # over subquery columns
    extra: Optional[B.BoundExpr]  # residual over combined columns
    null_aware: bool = False  # NOT IN semantics


def _requalify(node, alias: str, catalog):
    """Qualify unadorned table references in an attached view's body with
    its attach alias, so the view resolves in its own database's namespace
    (reference: binding inside AttachedDatabase's catalog)."""
    import dataclasses as _dc

    if isinstance(node, N.BaseTableRef) and not node.schema:
        q = f"{alias}.{node.name.lower()}"
        if q in catalog.tables or q in catalog.views:
            return _dc.replace(node, schema=alias)
        return node
    if _dc.is_dataclass(node) and not isinstance(node, type):
        kw = {f.name: _requalify(getattr(node, f.name), alias, catalog)
              for f in _dc.fields(node)}
        if all(kw[f.name] is getattr(node, f.name) for f in _dc.fields(node)):
            return node
        out = _dc.replace(node, **kw)
        if hasattr(node, "_sql_text"):
            out._sql_text = node._sql_text
        return out
    if isinstance(node, list):
        return [_requalify(v, alias, catalog) for v in node]
    if isinstance(node, tuple):
        return tuple(_requalify(v, alias, catalog) for v in node)
    return node


class Planner:
    def __init__(self, catalog, temp_views=None, default_schema="main"):
        self.catalog = catalog
        # per-connection TEMPORARY views (reference: temp schema is
        # connection-local, src/catalog/catalog_entry/schema_catalog_entry)
        self.temp_views = temp_views if temp_views is not None else {}
        # USE target: unqualified names search this schema first
        self.default_schema = default_schema
        self._key_counter = itertools.count()
        self.key_owner: Dict[str, int] = {}  # binding key → atom id

    def fresh(self, name: str) -> str:
        return f"{name}#{next(self._key_counter)}"

    # -- entry ---------------------------------------------------------------
    def plan_select(self, stmt: N.SelectStatement, outer_scope=None,
                    cte_scope: Optional[dict] = None):
        """→ (plan, output [(name, key, ltype)])."""
        from duckdb_tpu.planner import functions_ext as _fx

        if outer_scope is None and cte_scope is None:
            # top-level plan: track non-deterministic binds (now()/random())
            # — such plans must not be served from the plan cache (the
            # bind-time timestamp would freeze)
            _fx.NONDET_BOUND = False
        ctes = dict(cte_scope or {})
        if not hasattr(self, "_cte_use_count"):
            self._cte_use_count = {}
        for cte in stmt.ctes:
            ctes[cte.name.lower()] = cte
            self._cte_use_count[cte.name.lower()] = self._count_cte_refs(
                stmt, cte.name.lower())
        plan, output, scope = self.plan_query_node(
            stmt.node, outer_scope, ctes
        )
        if stmt.order_by:
            plan = self._plan_order(plan, stmt.order_by, output, scope)
        if stmt.limit is not None or stmt.offset is not None:
            n = off = None
            if stmt.limit is not None:
                n = int(ExprBinder(Scope()).bind(stmt.limit).const_value())
            off = (int(ExprBinder(Scope()).bind(stmt.offset).const_value())
                   if stmt.offset is not None else 0)
            plan = P.Limit(plan, n, off)
        if _fx.NONDET_BOUND:
            self.uncacheable = True
        return plan, output

    def plan_query_node(self, node, outer_scope, ctes):
        if isinstance(node, N.ValuesNode):
            # VALUES (..),(..) → UNION ALL of single-row selects
            sels = []
            for row in node.rows:
                sel = N.SelectNode()
                sel.select_list = [(e, f"col{i}")
                                   for i, e in enumerate(row)]
                sels.append(sel)
            out = sels[0]
            for s2 in sels[1:]:
                out = N.SetOpNode("union", True, out, s2)
            node = out
        if isinstance(node, N.SelectNode):
            return self.plan_select_node(node, outer_scope, ctes)
        if isinstance(node, N.SetOpNode):
            return self.plan_setop(node, outer_scope, ctes)
        raise BindError(f"unsupported query node {type(node).__name__}")

    def plan_setop(self, node: N.SetOpNode, outer_scope, ctes):
        lplan, lout, lscope = self.plan_query_node(node.left, outer_scope, ctes)
        rplan, rout, rscope = self.plan_query_node(node.right, outer_scope, ctes)
        if len(lout) != len(rout):
            raise BindError("set operation children must have same column count")
        if node.op == "union":
            # project right onto left's keys, concat, optional dedup
            items = []
            for (ln, lk, lt), (rn, rk, rt) in zip(lout, rout):
                e: B.BoundExpr = B.BoundColumnRef(rk, rt)
                if rt != lt:
                    e = B.BoundCast(e, max_logical_type(lt, rt))
                items.append((lk, e))
            rplan = P.Project(rplan, items)
            setop_keys = [(k, t) for _, k, t in lout]
            plan: P.PlanNode = P.SetOp("union_all", lplan, rplan, setop_keys)
            if not node.all:
                plan = P.Aggregate(plan, [(k, B.BoundColumnRef(k, t))
                                          for _, k, t in lout], [])
        else:
            # EXCEPT/INTERSECT → dedup left, semi/anti join against right
            jt = "semi" if node.op == "intersect" else "anti"
            lkeys = [B.BoundColumnRef(k, t) for _, k, t in lout]
            rkeys = [B.BoundColumnRef(k, t) for _, k, t in rout]
            dedup = P.Aggregate(lplan, [(k, B.BoundColumnRef(k, t))
                                        for _, k, t in lout], [])
            plan = P.Join(dedup, rplan, jt, lkeys, rkeys, None)
        return plan, lout, lscope

    # -- FROM planning -------------------------------------------------------
    def _count_cte_refs(self, obj, name: str) -> int:
        """Count table references to `name` in an AST subtree."""
        n = 0
        if isinstance(obj, N.BaseTableRef):
            if obj.name.lower() == name:
                n += 1
        if hasattr(obj, "__dataclass_fields__"):
            for f in obj.__dataclass_fields__:
                v = getattr(obj, f)
                if isinstance(v, (list, tuple)):
                    for x in v:
                        n += self._count_cte_refs(x, name)
                        if isinstance(x, tuple):
                            for y in x:
                                n += self._count_cte_refs(y, name)
                elif hasattr(v, "__dataclass_fields__") or isinstance(
                        v, (N.TableRef,)):
                    n += self._count_cte_refs(v, name)
        return n

    def _plan_base_table(self, ref: N.BaseTableRef, ctes):
        """Resolve a table reference; `FROM t a(x, y)` alias column lists
        rename the visible columns (reference: binder table alias handling,
        src/planner/binder/tableref/bind_basetableref.cpp)."""
        out = self._plan_base_table_inner(ref, ctes)
        if ref.column_aliases:
            plan, scope_adds, nrows = out
            scope_adds = [
                (a, ref.column_aliases[i] if i < len(ref.column_aliases)
                 else c, k, t)
                for i, (a, c, k, t) in enumerate(scope_adds)]
            return plan, scope_adds, nrows
        return out

    def _plan_base_table_inner(self, ref: N.BaseTableRef, ctes):
        name = ref.name.lower()
        alias = (ref.alias or ref.name).lower()
        if getattr(ref, "schema", None):
            # schema-qualified reference: bypass CTE lookup, resolve in the
            # catalog (tables, then views) under the qualified key
            qname = f"{ref.schema}.{ref.name}".lower()
            if qname in self.catalog.views:
                vast = self.catalog.views[qname]
                head = ref.schema.lower()
                if head in getattr(self.catalog, "attached", {}):
                    # an attached view's body names tables in ITS database;
                    # requalify unadorned references with the attach alias
                    vast = _requalify(vast, head, self.catalog)
                if getattr(self.catalog, "macros", None):
                    from duckdb_tpu.planner import macros as M

                    vast = M.expand_macros(vast)
                plan, output = self.plan_select(vast, None, ctes)
                return self._subquery_atom(plan, output, alias, None)
            return self._scan_of(qname, alias)
        if name not in ctes and self.default_schema != "main":
            # USE target searched first for unqualified names (CTEs shadow)
            q = f"{self.default_schema}.{name}"
            if self.catalog.has_table(q) or q in self.catalog.views:
                import dataclasses as _dc

                return self._plan_base_table_inner(
                    _dc.replace(ref, schema=self.default_schema,
                                alias=alias), ctes)
        if name in ctes:
            cte = ctes[name]
            sub_ctes = {k: v for k, v in ctes.items() if k != name}
            # materialize multi-referenced CTEs once (the reference's
            # materialized-CTE broadcast, src/execution/physical_plan/
            # plan_cte.cpp) — cached on the CTE node for this plan
            if not cte.recursive and getattr(cte, "_mat_table", None):
                return self._scan_of(cte._mat_table, alias)
            if (not cte.recursive and cte.materialized is not False
                    and self._cte_use_count.get(name, 0) > 1):
                plan, output = self.plan_select(cte.query, None, sub_ctes)
                tname = self._materialize_plan(
                    f"__cte_{name}", plan, output,
                    list(cte.column_aliases) or None)
                cte._mat_table = tname
                return self._scan_of(tname, alias)
            if cte.recursive and isinstance(cte.query.node, N.SetOpNode):
                tname = self._materialize_recursive_cte(name, cte, sub_ctes)
                entry = self.catalog.get_table(tname)
                cols = []
                scope_adds = []
                for cd in entry.columns:
                    key = self.fresh(f"{alias}.{cd.name}")
                    cols.append((cd.name, key, cd.ltype))
                    scope_adds.append((alias, cd.name, key, cd.ltype))
                return P.Scan(tname, alias, cols), scope_adds, entry.nrows
            plan, output = self.plan_select(cte.query, None, sub_ctes)
            cols = list(cte.column_aliases) if cte.column_aliases else None
            return self._subquery_atom(plan, output, alias, cols)
        if self.catalog.has_table(name):
            entry = self.catalog.get_table(name)
            cols = []
            scope_adds = []
            for cd in entry.columns:
                key = self.fresh(f"{alias}.{cd.name}")
                cols.append((cd.name, key, cd.ltype))
                scope_adds.append((alias, cd.name, key, cd.ltype))
            plan = P.Scan(name, alias, cols)
            return plan, scope_adds, entry.nrows
        if name in self.temp_views or name in self.catalog.views:
            vast = self.temp_views.get(name) or self.catalog.views[name]
            if getattr(self.catalog, "macros", None):
                from duckdb_tpu.planner import macros as M

                vast = M.expand_macros(vast)
            plan, output = self.plan_select(vast, None, ctes)
            return self._subquery_atom(plan, output, alias, None)
        raise BindError(f"Table with name {ref.name} does not exist!")

    def _materialize_recursive_cte(self, name, cte, sub_ctes) -> str:
        """Iterate WITH RECURSIVE to a fixpoint (reference:
        src/execution/operator/set/physical_recursive_cte.cpp), materializing
        each round into a working catalog table the recursive term scans."""
        import numpy as np
        from duckdb_tpu.catalog.catalog import ColumnDef, TableEntry
        from duckdb_tpu.execution.executor import Executor

        node = cte.query.node
        union_all = node.all
        tname = f"__rec_{name}_{next(self._key_counter)}"

        def run_term(term_node, ctes_for_term):
            sub_p = Planner(self.catalog)
            stmt = N.SelectStatement(term_node)
            plan, output = sub_p.plan_select(stmt, None, ctes_for_term)
            return Executor(self.catalog).run(plan, output), output

        res, output = run_term(node.left, sub_ctes)
        col_names = (list(cte.column_aliases) if cte.column_aliases
                     else [n for n, _, _ in output])
        entry = TableEntry(tname, [ColumnDef(cn, t) for cn, (_, _, t)
                                   in zip(col_names, output)])
        entry.nrows = 0
        self.catalog.create_table(entry, or_replace=True)

        seen = set()

        def to_columns(rows):
            """Python rows → columnar host data for this CTE's schema."""
            import datetime
            import decimal as pydec

            epoch = datetime.date(1970, 1, 1)
            cols = {}
            for ci, cd in enumerate(entry.columns):
                t = cd.ltype
                vals = [r[ci] for r in rows]
                valid = np.array([v is not None for v in vals], dtype=bool)
                if t.id is TypeId.VARCHAR:
                    strs = np.array([("" if v is None else str(v))
                                     for v in vals], dtype=object)
                    uniq, codes = np.unique(strs.astype(str),
                                            return_inverse=True)
                    cols[cd.name] = (codes.astype(np.int32),
                                     None if valid.all() else valid,
                                     uniq.astype(object))
                elif t.id is TypeId.DECIMAL:
                    phys = np.array([0 if v is None else
                                     int(pydec.Decimal(str(v)).scaleb(t.scale))
                                     for v in vals], dtype=np.int64)
                    cols[cd.name] = (phys, None if valid.all() else valid, None)
                elif t.id.name == "DATE":
                    phys = np.array([0 if v is None else (v - epoch).days
                                     for v in vals], dtype=t.np_dtype)
                    cols[cd.name] = (phys, None if valid.all() else valid, None)
                else:
                    phys = np.array([0 if v is None else v for v in vals],
                                    dtype=t.np_dtype)
                    cols[cd.name] = (phys, None if valid.all() else valid, None)
            return cols

        def append_rows(rows):
            if not rows:
                return
            cols = to_columns(rows)
            for cd in entry.columns:
                vals, valid, dvals = cols[cd.name]
                if entry.nrows == 0:
                    entry.set_host_column(cd.name, vals, validity=valid,
                                          dict_values=dvals)
                else:
                    ov, ovd, od = entry.host_column(cd.name)
                    if cd.ltype.id is TypeId.VARCHAR:
                        old_strs = (od[ov] if od is not None
                                    else np.empty(0, object))
                        new_strs = (dvals[vals] if dvals is not None
                                    else np.empty(0, object))
                        allv = np.concatenate([old_strs, new_strs]).astype(str)
                        uniq, codes = np.unique(allv, return_inverse=True)
                        entry.set_host_column(cd.name, codes.astype(np.int32),
                                              dict_values=uniq.astype(object))
                    else:
                        entry.set_host_column(
                            cd.name,
                            np.concatenate([ov, vals.astype(ov.dtype)]))
            entry.nrows += len(rows)

        def fresh_delta(rows):
            cols = to_columns(rows) if rows else None
            delta_entry = TableEntry(delta_table, list(entry.columns))
            delta_entry.nrows = len(rows)
            for cd in delta_entry.columns:
                if rows:
                    vals, valid, dvals = cols[cd.name]
                else:
                    vals, valid, dvals = (np.empty(0, cd.ltype.np_dtype),
                                          None, None)
                delta_entry.set_host_column(cd.name, vals, validity=valid,
                                            dict_values=dvals)
            self.catalog.create_table(delta_entry, or_replace=True)

        delta_table = f"__recdelta_{name}_{next(self._key_counter)}"
        rows = res.rows()
        if not union_all:
            rows = [r for r in rows if not (r in seen or seen.add(r))]
        append_rows(rows)
        delta = rows
        iters = 0
        while delta and iters < 10_000:
            iters += 1
            # the recursive term sees only the LAST round's delta (the
            # reference's working-table semantics,
            # physical_recursive_cte.cpp)
            fresh_delta(delta)
            rec_ctes = dict(sub_ctes)
            rec_ctes[name] = N.CTE(
                name, N.SelectStatement(N.SelectNode(
                    select_list=[(N.Star(), None)],
                    from_table=N.BaseTableRef(delta_table))),
                cte.column_aliases)
            res, _ = run_term(node.right, rec_ctes)
            rows = res.rows()
            if not union_all:
                rows = [r for r in rows if not (r in seen or seen.add(r))]
            append_rows(rows)
            delta = rows
        self.catalog.drop_table(delta_table, if_exists=True)
        return tname

    def _scan_of(self, tname: str, alias: str):
        entry = self.catalog.get_table(tname)
        cols = []
        scope_adds = []
        for cd in entry.columns:
            key = self.fresh(f"{alias}.{cd.name}")
            cols.append((cd.name, key, cd.ltype))
            scope_adds.append((alias, cd.name, key, cd.ltype))
        return P.Scan(tname, alias, cols), scope_adds, entry.nrows

    def _materialize_plan(self, base_name, plan, output, col_aliases):
        """Execute a plan now and store the result as a hidden table."""
        import numpy as np
        from duckdb_tpu.catalog.catalog import ColumnDef, TableEntry
        from duckdb_tpu.execution.executor import Executor

        res = Executor(self.catalog).run(plan, output)
        names = (col_aliases if col_aliases
                 else [n for n, _, _ in output])
        tname = f"{base_name}_{next(self._key_counter)}"
        entry = TableEntry(tname, [ColumnDef(nm, t) for nm, (_, _, t)
                                   in zip(names, output)])
        entry.nrows = res.nrows
        for cd, (vals, valid, dvals) in zip(entry.columns, res.columns):
            entry.set_host_column(cd.name, np.asarray(vals), validity=valid,
                                  dict_values=dvals)
        self.catalog.create_table(entry, or_replace=True)
        return tname

    def _subquery_atom(self, plan, output, alias, col_aliases):
        scope_adds = []
        for i, (n, key, t) in enumerate(output):
            cn = col_aliases[i] if col_aliases and i < len(col_aliases) else n
            scope_adds.append((alias, cn, key, t))
        nrows = 10_000  # unknown; middle-of-road estimate
        return plan, scope_adds, nrows

    def _plan_sample(self, plan, sample):
        """USING SAMPLE / TABLESAMPLE tuple → P.Sample wrapper."""
        amount_ast, unit, method, seed = sample
        be = ExprBinder(Scope()).bind(amount_ast)
        v = be.const_value()
        from duckdb_tpu.types import TypeId as _TID

        if be.ltype.id is _TID.DECIMAL:
            v = v / (10 ** be.ltype.scale)
        if unit == "percent":
            return P.Sample(plan, percent=float(v), method=method, seed=seed)
        return P.Sample(plan, rows=int(v), method=method, seed=seed)

    def collect_atoms(self, ref: N.TableRef, ctes, scope: Scope,
                      atoms: List[Atom], pred_asts: List[N.Expr]):
        """Flatten a FROM tree into atoms + predicate ASTs (inner joins only).

        Outer joins are planned as nested subtrees once both sides collect.
        """
        if ref is None:
            # FROM-less SELECT nested as a subquery (IN (SELECT 1), EXISTS
            # (SELECT 42), ...): one constant live row, no bindings
            # (reference: src/planner/binder/tableref/bind_emptytableref.cpp)
            atoms.append(Atom(len(atoms) + 20_000, _ConstantRow(), 1, set()))
            return
        if isinstance(ref, N.BaseTableRef):
            plan, scope_adds, nrows = self._plan_base_table(ref, ctes)
            tbl = (ref.name.lower()
                   if ref.name.lower() not in ctes
                   and self.catalog.has_table(ref.name.lower()) else None)
            if getattr(ref, "sample", None) is not None:
                plan = self._plan_sample(plan, ref.sample)
                tbl = None  # sampled scan: zone-map shortcuts no longer exact
            self._add_atom(plan, scope_adds, nrows, scope, atoms, table=tbl)
            return
        if isinstance(ref, N.SubqueryRef):
            alias = (ref.alias or f"subq{len(atoms)}").lower()
            plan, output = self.plan_select(ref.subquery, None, ctes)
            plan2, scope_adds, nrows = self._subquery_atom(
                plan, output, alias, list(ref.column_aliases) or None
            )
            self._add_atom(plan2, scope_adds, nrows, scope, atoms)
            return
        if isinstance(ref, N.JoinRef):
            jt = ref.join_type
            if jt in ("inner", "cross"):
                self.collect_atoms(ref.left, ctes, scope, atoms, pred_asts)
                self.collect_atoms(ref.right, ctes, scope, atoms, pred_asts)
                if ref.condition is not None:
                    pred_asts.extend(split_conjuncts(ref.condition))
                for col in ref.using:
                    la = _ref_alias(ref.left)
                    ra = _ref_alias(ref.right)
                    if la is None or ra is None:
                        raise BindError("USING requires named join operands")
                    pred_asts.append(N.BinaryOp(
                        "=", N.ColumnRef((la, col)), N.ColumnRef((ra, col))))
                    # SELECT * shows a USING column once (the left side's);
                    # matching is case-insensitive like all identifiers
                    hidden = scope.__dict__.setdefault("star_hidden", set())
                    hidden.add((str(ra).lower(), col.lower()))
                return
            if jt == "positional":
                left_atoms: List[Atom] = []
                right_atoms: List[Atom] = []
                lpreds: List[N.Expr] = []
                rpreds: List[N.Expr] = []
                self.collect_atoms(ref.left, ctes, scope, left_atoms, lpreds)
                self.collect_atoms(ref.right, ctes, scope, right_atoms,
                                   rpreds)
                binder = self._pred_binder(scope, ctes)
                lplan = self.plan_pool(left_atoms,
                                       [binder.bind(c) for c in lpreds])
                rplan = self.plan_pool(right_atoms,
                                       [binder.bind(c) for c in rpreds])
                keys = set().union(*[a.keys for a in left_atoms
                                     + right_atoms])
                atoms.append(Atom(len(atoms),
                                  P.PositionalJoin(lplan, rplan),
                                  max(sum(a.rows for a in left_atoms), 1),
                                  keys))
                for k in keys:
                    self.key_owner[k] = atoms[-1].id
                return
            if jt in ("left", "right", "semi", "anti", "full", "asof",
                      "asof_left"):
                # plan both sides as independent pools, then a join node
                left_atoms: List[Atom] = []
                right_atoms: List[Atom] = []
                lpreds: List[N.Expr] = []
                rpreds: List[N.Expr] = []
                self.collect_atoms(ref.left, ctes, scope, left_atoms, lpreds)
                self.collect_atoms(ref.right, ctes, scope, right_atoms, rpreds)
                binder = self._pred_binder(scope, ctes)
                cond = [binder.bind(c) for c in split_conjuncts(ref.condition)]
                cond += [binder.bind(c) for c in lpreds + rpreds]
                lkeyset = set().union(*[a.keys for a in left_atoms])
                rkeyset = set().union(*[a.keys for a in right_atoms])
                lplan = self.plan_pool(
                    left_atoms,
                    [c for c in cond if self._keys_of(c) <= lkeyset],
                )
                rplan = self.plan_pool(
                    right_atoms,
                    [c for c in cond if self._keys_of(c) <= rkeyset
                     and not (self._keys_of(c) <= lkeyset)],
                )
                across = [c for c in cond
                          if not (self._keys_of(c) <= lkeyset)
                          and not (self._keys_of(c) <= rkeyset)]
                # keyless joins (no equi condition) are supported for all
                # join types via the executor's IEJoin / cross-expansion
                # tail, so non-equi outer joins bind fine
                pk, bk, extra = self._split_join_conds(
                    across, lkeyset, rkeyset, allow_no_eq=True)
                if jt in ("asof", "asof_left") and extra is None:
                    raise BindError(
                        "ASOF JOIN requires an inequality condition")
                if jt == "right":
                    jt2, probe, build = "left", rplan, lplan
                    pk, bk = bk, pk
                else:
                    jt2, probe, build = jt, lplan, rplan
                plan = P.Join(probe, build, jt2, pk, bk, extra)
                keys = lkeyset | (rkeyset if jt2 != "semi" and jt2 != "anti" else set())
                if jt2 in ("semi", "anti"):
                    # build columns leave scope: SELECT t2.y after a SEMI
                    # JOIN must be a binder error, not an executor KeyError
                    scope.remove_keys(rkeyset)
                aid = len(atoms) + 10_000
                atom = Atom(aid, plan, 100_000, lkeyset | rkeyset)
                for k in atom.keys:
                    self.key_owner[k] = atom.id
                atoms.append(atom)
                return
            raise BindError(f"join type {jt} not supported")
        if isinstance(ref, N.TableFunctionRef):
            mac = getattr(self.catalog, "table_macros",
                          {}).get(ref.name.lower())
            if mac is not None:
                # table macro: substitute args into the stored SELECT and
                # plan it as a derived table (reference:
                # src/function/table_macro_function.cpp)
                from duckdb_tpu.planner import macros as M

                pos, named = M.split_args(ref.args)
                try:
                    body = M.expand_macros(M.expand_call(mac, pos, named))
                except M.MacroError as err:
                    raise BindError(str(err))
                sref = N.SubqueryRef(body, alias=ref.alias or ref.name,
                                     column_aliases=ref.column_aliases)
                with M.expansion_guard(ref.name):
                    return self.collect_atoms(sref, ctes, scope, atoms,
                                              pred_asts)
            plan, scope_adds, nrows, tbl = self._plan_table_function(ref, ctes)
            self._add_atom(plan, scope_adds, nrows, scope, atoms, table=tbl)
            return
        raise BindError(f"FROM element {type(ref).__name__} not supported")

    def _plan_table_function(self, ref: N.TableFunctionRef, ctes):
        """Built-in table functions (reference: src/function/table/)."""
        import numpy as np
        from duckdb_tpu.catalog.catalog import ColumnDef, TableEntry

        name = ref.name.lower()
        binder = ExprBinder(Scope())
        # split out named parameters (ident := expr / ident => expr; a bare
        # `ident = expr` in a TF arg list is also a named param — there are
        # no columns in scope to compare against)
        named = {}
        pos_args = []
        for a in ref.args:
            if (isinstance(a, N.BinaryOp) and a.op in (":=", "=>", "=", "==")
                    and isinstance(a.left, N.ColumnRef)):
                named[a.left.parts[-1].lower()] = \
                    binder.bind(a.right).const_value()
            else:
                pos_args.append(a)

        def _const(a):
            # list literals (['a.csv', 'b.csv']) fold element-wise
            if isinstance(a, N.FunctionCall) and a.name == "list_value":
                return [_const(x) for x in a.args]
            return binder.bind(a).const_value()

        args = [_const(a) for a in pos_args]
        alias = (ref.alias or name).lower()
        # named parameters validate against the target function's accepted
        # set — unknown names (typos like union_by_names=true) raise
        # instead of silently dropping (reference: named-parameter binding
        # in src/planner/binder/tableref/bind_table_function.cpp)
        _FILE_FNS = ("read_csv", "read_csv_auto", "read_parquet",
                     "parquet_scan", "read_json", "read_json_auto",
                     "read_ndjson", "__file_scan")
        accepted = ({"union_by_name", "hive_partitioning", "filename"}
                    if name in _FILE_FNS else set())
        for pname in named:
            if pname not in accepted:
                raise BindError(
                    f'Invalid named parameter "{pname}" for function {name}'
                    + (f"; accepted: {', '.join(sorted(accepted))}"
                       if accepted else ""))
        if name in _FILE_FNS:
            paths = args[0]
            if not isinstance(paths, (list, tuple, np.ndarray)):
                paths = str(paths)
            tname = self.catalog.ensure_file_table(
                paths,
                union_by_name=bool(named.get("union_by_name", False)),
                hive_partitioning=named.get("hive_partitioning"),
                filename=bool(named.get("filename", False)))
        elif name == "repeat":
            # repeat(value, count) table function (reference:
            # src/function/table/repeat.cpp)
            v, cnt = args[0], int(args[1])
            tname = f"__repeat_{self.fresh('tf')}".replace("#", "_").lower()
            if isinstance(v, str):
                entry = TableEntry(tname, [ColumnDef("repeat", VARCHAR)])
                entry.nrows = cnt
                entry.set_host_column(
                    "repeat", np.zeros(cnt, np.int32),
                    dict_values=np.array([v], dtype=object))
            else:
                lt = DOUBLE if isinstance(v, float) else BIGINT
                entry = TableEntry(tname, [ColumnDef("repeat", lt)])
                entry.nrows = cnt
                entry.set_host_column(
                    "repeat", np.full(cnt, v, dtype=lt.np_dtype))
            self.catalog.create_table(entry, or_replace=True)
        elif name in ("range", "generate_series"):
            if len(args) == 1:
                lo, hi, step = 0, int(args[0]), 1
            else:
                lo, hi = int(args[0]), int(args[1])
                step = int(args[2]) if len(args) > 2 else 1
            if name == "generate_series":
                hi = hi + (1 if step > 0 else -1)  # inclusive end
            vals = np.arange(lo, hi, step, dtype=np.int64)
            tname = f"__{name}_{self.fresh('tf')}".replace("#", "_").lower()
            entry = TableEntry(tname, [ColumnDef("range", BIGINT)])
            entry.nrows = len(vals)
            entry.set_host_column("range", vals)
            self.catalog.create_table(entry, or_replace=True)
        elif name in ("duckdb_tables", "duckdb_columns", "duckdb_views",
                      "duckdb_settings", "pragma_table_info", "duckdb_types",
                      "duckdb_functions", "duckdb_logs", "duckdb_indexes"):
            tname = self._system_table_function(name, args)
        else:
            raise BindError(
                f"Table Function with name {ref.name} does not exist!"
            )
        entry = self.catalog.get_table(tname)
        cols = []
        scope_adds = []
        for cd in entry.columns:
            key = self.fresh(f"{alias}.{cd.name}")
            cols.append((cd.name, key, cd.ltype))
            scope_adds.append((alias, cd.name, key, cd.ltype))
        if ref.column_aliases:
            scope_adds = [(alias, ref.column_aliases[i] if i < len(ref.column_aliases) else c,
                           k, t) for i, (a, c, k, t) in enumerate(scope_adds)]
        return P.Scan(tname, alias, cols), scope_adds, entry.nrows, tname

    def _system_table_function(self, name: str, args) -> str:
        """Catalog introspection TFs (reference: src/function/table/system/).

        Snapshots catalog/log/settings state into a ``__sys_*`` table at
        plan time — so plans containing one must never be reused from the
        plan cache (a cached plan would replay the stale snapshot)."""
        self.uncacheable = True
        import numpy as np
        from duckdb_tpu.catalog.catalog import ColumnDef, TableEntry
        from duckdb_tpu.types import VARCHAR as VC, BIGINT as BI, BOOLEAN as BO

        def make(tname, cols, rows):
            entry = TableEntry(tname, [ColumnDef(n, t) for n, t in cols])
            entry.nrows = len(rows)
            for ci, (cname, t) in enumerate(cols):
                vals = [r[ci] for r in rows]
                valid = np.array([v is not None for v in vals], dtype=bool)
                validity = None if valid.all() else valid
                if t.id is TypeId.VARCHAR:
                    svals = ["" if v is None else str(v) for v in vals]
                    uniq, codes = (np.unique(np.array(svals, dtype=str),
                                             return_inverse=True)
                                   if vals else (np.empty(0, object),
                                                 np.empty(0, np.int64)))
                    entry.set_host_column(cname, codes.astype(np.int32),
                                          validity=validity,
                                          dict_values=uniq.astype(object))
                else:
                    entry.set_host_column(
                        cname,
                        np.array([0 if v is None else v for v in vals],
                                 dtype=t.np_dtype), validity=validity)
            self.catalog.create_table(entry, or_replace=True)
            return tname

        user_tables = [(n, e) for n, e in sorted(self.catalog.tables.items())
                       if not n.startswith("__")]
        comments = getattr(self.catalog, "comments", {})
        if name == "duckdb_tables":
            rows = [(n.split(".")[-1],
                     n.split(".")[0] if "." in n else "main",
                     e.nrows, len(e.columns),
                     comments.get(("table", n.lower())))
                    for n, e in user_tables]
            return make("__sys_tables", [("name", VC), ("schema_name", VC),
                                         ("estimated_size", BI),
                                         ("column_count", BI),
                                         ("comment", VC)], rows)
        if name == "duckdb_columns":
            rows = []
            for n, e in user_tables:
                for i, cd in enumerate(e.columns):
                    rows.append((n, cd.name, i, str(cd.ltype),
                                 comments.get(("column", n.lower(),
                                               cd.name.lower()))))
            return make("__sys_columns", [("table_name", VC),
                                          ("column_name", VC),
                                          ("column_index", BI),
                                          ("data_type", VC),
                                          ("comment", VC)], rows)
        if name == "duckdb_views":
            rows = [(n, "main", comments.get(("view", n.lower())))
                    for n in sorted(self.catalog.views)]
            return make("__sys_views", [("view_name", VC),
                                        ("schema_name", VC),
                                        ("comment", VC)], rows)
        if name == "duckdb_indexes":
            rows = [(iname, info["table"], bool(info.get("unique")),
                     ", ".join(info.get("exprs", [])),
                     comments.get(("index", iname)))
                    for iname, info in sorted(
                        getattr(self.catalog, "indexes", {}).items())]
            return make("__sys_indexes", [("index_name", VC),
                                          ("table_name", VC),
                                          ("is_unique", BO),
                                          ("expressions", VC),
                                          ("comment", VC)], rows)
        if name == "duckdb_settings":
            mgr = getattr(self.catalog, "settings_manager", None)
            rows = mgr.rows() if mgr else []
            return make("__sys_settings", [("name", VC), ("value", VC),
                                           ("description", VC),
                                           ("input_type", VC),
                                           ("scope", VC)], rows)
        if name == "pragma_table_info":
            t = self.catalog.get_table(str(args[0]))
            rows = [(i, cd.name, str(cd.ltype), False, "", False)
                    for i, cd in enumerate(t.columns)]
            return make("__sys_table_info", [("cid", BI), ("name", VC),
                                             ("type", VC), ("notnull", BO),
                                             ("dflt_value", VC), ("pk", BO)],
                        rows)
        if name == "duckdb_types":
            from duckdb_tpu.planner.binder import _TYPE_NAMES

            rows = sorted({(str(t), n) for n, t in _TYPE_NAMES.items()})
            return make("__sys_types", [("logical_type", VC),
                                        ("sql_name", VC)], rows)
        if name == "duckdb_logs":
            mgr = getattr(self.catalog, "log_manager", None)
            rows = mgr.rows() if mgr else []
            return make("__sys_logs", [("timestamp", VC), ("log_level", VC),
                                       ("type", VC), ("message", VC)], rows)
        if name == "duckdb_functions":
            from duckdb_tpu.planner.functions import REGISTRY
            from duckdb_tpu.planner.binder import AGGREGATE_NAMES

            rows = [(f, "scalar") for f in sorted(REGISTRY)]
            rows += [(f, "aggregate") for f in sorted(AGGREGATE_NAMES)]
            return make("__sys_functions", [("function_name", VC),
                                            ("function_type", VC)], rows)
        raise BindError(name)

    def _add_atom(self, plan, scope_adds, nrows, scope: Scope, atoms: List[Atom],
                  table: Optional[str] = None):
        aid = len(atoms)
        keys = set()
        col_of = {}
        for alias, col, key, t in scope_adds:
            scope.add(alias, col, key, t)
            keys.add(key)
            self.key_owner[key] = aid
            if table is not None:
                col_of[key] = (table, col)
        atoms.append(Atom(aid, plan, nrows, keys, col_of))

    def _keys_of(self, e: B.BoundExpr) -> Set[str]:
        return {n.key for n in B.walk(e) if isinstance(n, B.BoundColumnRef)}

    def _atoms_of(self, e: B.BoundExpr, key2atom) -> Set[int]:
        return {key2atom[k] for k in self._keys_of(e) if k in key2atom}

    def _split_join_conds(self, conds, lkeys, rkeys, allow_no_eq=False):
        """Partition cross-side conditions into equi keys + residual."""
        pk, bk, residual = [], [], []
        for c in conds:
            if (isinstance(c, B.BoundComparison) and c.op in ("=", "==")):
                ks_l, ks_r = self._keys_of(c.left), self._keys_of(c.right)
                if ks_l <= lkeys and ks_r <= rkeys:
                    pk.append(c.left)
                    bk.append(c.right)
                    continue
                if ks_l <= rkeys and ks_r <= lkeys:
                    pk.append(c.right)
                    bk.append(c.left)
                    continue
            residual.append(c)
        extra = B.BoundConjunction("and", residual) if residual else None
        if len(residual) == 1:
            extra = residual[0]
        if not pk and extra is not None and not allow_no_eq:
            raise BindError("non-equi outer join without equi keys unsupported")
        return pk, bk, extra

    # -- predicate binding with subquery flattening ---------------------------
    def _pred_binder(self, scope: Scope, ctes=None) -> ExprBinder:
        if ctes is None:
            ctes = {}
        return ExprBinder(
            scope,
            subquery_binder=lambda e, b: self._bind_subquery_expr(e, b, ctes),
        )

    def _bind_subquery_expr(self, e, binder: ExprBinder, ctes):
        """Scalar/IN/EXISTS subquery inside an arbitrary expression.

        Uncorrelated scalar subqueries become lazy constants. Correlated
        forms are handled at conjunct level by the flattener; reaching here
        means unsupported placement.
        """
        if isinstance(e, N.ScalarSubquery):
            plan, output = self.plan_select(e.subquery, None, ctes)
            name, key, t = output[0]
            return BoundScalarSubquery(self, plan, key, t)
        if isinstance(e, N.InSubquery):
            # MARK join: IN in a general expression position (uncorrelated)
            child = binder.bind(e.expr)
            plan, output = self.plan_select(e.subquery, None, ctes)
            name, key, t = output[0]
            return BoundMarkSubquery(self, child, plan, key, t, e.negated)
        if isinstance(e, N.Exists):
            try:
                plan, output = self.plan_select(e.subquery, None, ctes)
            except BindError:
                mark = self._correlated_mark(e.subquery, binder.scope, ctes,
                                             e.negated)
                if mark is not None:
                    return mark
                raise
            name, key, t = output[0]
            return BoundMarkSubquery(self, None, plan, key, t, e.negated)
        raise BindError(
            f"{type(e).__name__} subquery only supported as a top-level WHERE conjunct"
        )

    def _correlated_mark(self, sub, scope, ctes, negated):
        """Correlated EXISTS in ANY expression position (e.g. inside OR) →
        membership mark: `EXISTS(SELECT .. WHERE inner.k = outer.k AND
        local)` is `outer.k IN (SELECT inner.k FROM .. WHERE local)`, with
        EXISTS two-valued semantics (NULL probe → FALSE). Single-key
        correlation. Reference: correlated MARK joins,
        src/planner/subquery/flatten_dependent_join.cpp."""
        outer_keys = set()
        s = scope
        while s is not None:
            outer_keys |= {b.key for (_, _, b) in s.order}
            s = s.parent
        try:
            (sub_atoms, local_bound, corr_eqs, corr_extra, sub_scope,
             sel, sub_semis) = self._plan_sub_pool(sub, scope, ctes,
                                                   outer_keys)
        except BindError:
            return None
        if len(corr_eqs) != 1 or corr_extra:
            return None
        build = self.plan_pool(sub_atoms, local_bound)
        for ss in sub_semis:
            build = P.Join(build, ss.build_plan, ss.jtype, ss.probe_keys,
                           ss.build_keys, ss.extra, null_aware=ss.null_aware)
        outer_e, inner_e = corr_eqs[0]
        out_key = self.fresh("corrmark")
        build = P.Project(build, [(out_key, inner_e)])
        return BoundMarkSubquery(self, outer_e, build, out_key,
                                 inner_e.ltype, negated,
                                 exists_semantics=True)

    # -- pool join ordering ---------------------------------------------------
    def plan_pool(self, atoms: List[Atom], preds: List[B.BoundExpr]) -> P.PlanNode:
        """Join all atoms; apply predicates as soon as their support is joined."""
        if not atoms:
            raise BindError("empty FROM")
        key2atom = {}
        for a in atoms:
            for k in a.keys:
                key2atom[k] = a.id
        by_id = {a.id: a for a in atoms}

        # push single-atom predicates (scaling the atom's row estimate —
        # feeds both the DP cost model and the greedy spine choice)
        from duckdb_tpu.planner.join_order import (dp_join_order,
                                                   estimate_selectivity)

        multi = []
        for p in preds:
            sup = self._atoms_of(p, key2atom)
            if len(sup) <= 1:
                aid = next(iter(sup)) if sup else atoms[0].id
                a = by_id[aid]
                a.plan = P.Filter(a.plan, p)
                try:
                    sel = estimate_selectivity(self, p, a)
                except Exception:
                    sel = 0.5
                a.rows = max(1, int(a.rows * sel))
            else:
                multi.append(p)

        # DP join ordering over the query graph (reference:
        # src/optimizer/join_order/); greedy below is the fallback for
        # oversized / disconnected graphs or when disabled via SET
        mgr = getattr(self.catalog, "settings_manager", None)
        jo_mode = str(mgr.get("join_order", "dp")) if mgr else "dp"
        if jo_mode == "dp" and len(by_id) >= 3:
            dp_plan = dp_join_order(self, by_id, multi)
            if dp_plan is not None:
                return dp_plan

        # snowflake collapse: pre-join fanout-1 dimension chains into their
        # parent atom, bottom-up, so the fact spine probes each chain ONCE.
        # A left-deep spine probes every dimension at FACT length (probe-
        # preserving direct-address joins cost O(probe rows) each); joining
        # customer into orders first costs O(orders) instead of O(lineitem)
        # — measured 54 ms per fact-length probe chain link at SF1 on v5e.
        # The reference reaches the same shapes through DP join ordering
        # (src/optimizer/join_order/); this is the bushy special case that
        # matters for star/snowflake schemas (TPC-H Q3/Q5/Q7-Q10).
        if len(by_id) > 2:
            spine_id = max(by_id.values(),
                           key=lambda a: (getattr(a, "base_rows", 0)
                                          or a.rows, a.rows)).id
            changed = True
            while changed and len(by_id) > 2:
                changed = False
                for a in sorted(by_id.values(), key=lambda x: x.rows):
                    if a.id == spine_id:
                        continue
                    for b in sorted(by_id.values(), key=lambda x: x.rows):
                        if b.id in (a.id, spine_id) or b.rows > a.rows:
                            continue
                        edges = self._edges_between(multi, a.keys, b.keys)
                        if not edges or self._fanout_estimate(b, edges) > 1.01:
                            continue
                        pk = [e[1] for e in edges]
                        bk = [e[2] for e in edges]
                        used = [e[0] for e in edges]
                        multi = [p for p in multi
                                 if not any(p is u for u in used)]
                        a.plan = P.Join(a.plan, b.plan, "inner", pk, bk, None)
                        a.keys = set(a.keys) | set(b.keys)
                        a.col_of.update(b.col_of)
                        del by_id[b.id]
                        for k in b.keys:
                            key2atom[k] = a.id
                        # predicates now fully inside the merged atom
                        rest = []
                        for p in multi:
                            if self._keys_of(p) <= a.keys:
                                a.plan = P.Filter(a.plan, p)
                            else:
                                rest.append(p)
                        multi = rest
                        changed = True
                        break
                    if changed:
                        break

        remaining = dict(by_id)
        # start from the largest atom (fact-table probe spine) by BASE
        # table size: filtered estimates flip a fact below a dimension,
        # making the fact the duplicate-key BUILD — which kills the fused
        # unique-build pipeline (same rule as dp emit; q12 regression)
        cur = max(remaining.values(),
                  key=lambda a: (getattr(a, "base_rows", 0) or a.rows,
                                 a.rows))
        del remaining[cur.id]
        joined_keys = set(cur.keys)
        joined_ids = {cur.id}
        plan = cur.plan
        pending = list(multi)

        def try_apply_pending(plan):
            nonlocal pending
            rest = []
            for p in pending:
                if self._keys_of(p) <= joined_keys:
                    plan = P.Filter(plan, p)
                else:
                    rest.append(p)
            pending = rest
            return plan

        while remaining:
            # candidate atoms connected by at least one equi edge, scored by
            # estimated join fanout (PK-range edge ⇒ 1) then size — the
            # greedy spirit of the reference's join-order optimizer
            # (src/optimizer/join_order/) without its full DP.
            best = None
            best_score = None
            for a in remaining.values():
                edges = self._edges_between(pending, joined_keys, a.keys)
                if edges:
                    fanout = self._fanout_estimate(a, edges)
                    score = (fanout, a.rows)
                    if best is None or score < best_score:
                        best = (a, edges)
                        best_score = score
            if best is None:
                # no equi edge: prefer an atom connected by inequality
                # predicates — a keyless Join whose extra drives the
                # executor's IEJoin sorted-range path (physical_iejoin.cpp
                # analog) instead of a blind cross product
                pick = None
                for a in remaining.values():
                    conds = self._ineq_conds_between(
                        pending, joined_keys, a.keys)
                    if conds and (pick is None or a.rows < pick[0].rows):
                        pick = (a, conds)
                if pick is not None:
                    a, conds = pick
                    del remaining[a.id]
                    pending = [p for p in pending
                               if not any(p is c for c in conds)]
                    extra = (conds[0] if len(conds) == 1
                             else B.BoundConjunction("and", conds))
                    plan = P.Join(plan, a.plan, "inner", [], [], extra)
                    joined_keys |= a.keys
                    joined_ids.add(a.id)
                    plan = try_apply_pending(plan)
                    continue
                # no connection at all: cross join the smallest
                a = min(remaining.values(), key=lambda x: x.rows)
                del remaining[a.id]
                plan = P.CrossJoin(plan, a.plan)
                joined_keys |= a.keys
                joined_ids.add(a.id)
                plan = try_apply_pending(plan)
                continue
            a, edges = best
            del remaining[a.id]
            pk, bk, used = [], [], []
            for p, probe_side, build_side in edges:
                pk.append(probe_side)
                bk.append(build_side)
                used.append(p)
            pending = [p for p in pending if not any(p is u for u in used)]
            plan = P.Join(plan, a.plan, "inner", pk, bk, None)
            joined_keys |= a.keys
            joined_ids.add(a.id)
            plan = try_apply_pending(plan)
        if pending:
            for p in pending:
                plan = P.Filter(plan, p)
        return plan

    def _fanout_estimate(self, atom: Atom, edges) -> float:
        """Rows matched per probe row: build_rows / Π per-edge key ranges."""
        denom = 1.0
        for _, probe_side, build_side in edges:
            rng = None
            if isinstance(build_side, B.BoundColumnRef):
                tc = atom.col_of.get(build_side.key)
                if tc is not None:
                    st = self.catalog.get_table(tc[0]).stats_for(tc[1])
                    if st.min_val is not None and st.max_val is not None:
                        rng = max(1, int(st.max_val) - int(st.min_val) + 1)
                    if st.n_unique is not None:
                        rng = max(rng or 1, st.n_unique)
            if rng is not None:
                denom *= rng
        return max(1.0, atom.rows / denom)

    def _ineq_conds_between(self, preds, lkeys: Set[str], rkeys: Set[str]):
        """Predicates spanning both key sets, of which at least one is a
        two-sided inequality comparison (the IEJoin sort predicate). All
        spanning predicates ride along as the keyless join's residual."""
        both = lkeys | rkeys
        spanning, has_ineq = [], False
        for p in preds:
            ks = self._keys_of(p)
            if not (ks and ks <= both and (ks & lkeys) and (ks & rkeys)):
                continue
            spanning.append(p)
            if (isinstance(p, B.BoundComparison)
                    and p.op in ("<", "<=", ">", ">=")):
                kl, kr = self._keys_of(p.left), self._keys_of(p.right)
                if ((kl <= lkeys and kr <= rkeys)
                        or (kl <= rkeys and kr <= lkeys)):
                    has_ineq = True
        return spanning if has_ineq else []

    def _edges_between(self, preds, joined_keys: Set[str], atom_keys: Set[str]):
        out = []
        for p in preds:
            if not isinstance(p, B.BoundComparison) or p.op not in ("=", "=="):
                continue
            kl, kr = self._keys_of(p.left), self._keys_of(p.right)
            if kl and kr:
                if kl <= joined_keys and kr <= atom_keys:
                    out.append((p, p.left, p.right))
                elif kr <= joined_keys and kl <= atom_keys:
                    out.append((p, p.right, p.left))
        return out

    # -- SELECT node ----------------------------------------------------------
    def plan_select_node(self, sel: N.SelectNode, outer_scope, ctes):
        scope = Scope(parent=outer_scope)
        atoms: List[Atom] = []
        pred_asts: List[N.Expr] = []
        if sel.from_table is not None:
            self.collect_atoms(sel.from_table, ctes, scope, atoms, pred_asts)
        pred_asts = pred_asts + split_conjuncts(sel.where)
        pred_asts = [h for p in pred_asts for h in hoist_or_common(p)]

        binder = self._pred_binder(scope, ctes)
        bound_preds: List[B.BoundExpr] = []
        semis: List[SemiSpec] = []
        local_keys = set().union(*[a.keys for a in atoms]) if atoms else set()

        for ast in pred_asts:
            handled = self._flatten_conjunct(ast, scope, ctes, local_keys,
                                             bound_preds, semis, atoms)
            if not handled:
                bound_preds.append(binder.bind(ast))

        if atoms:
            plan = self.plan_pool(atoms, bound_preds)
        else:
            plan = _ConstantRow()
        for s in semis:
            plan = P.Join(plan, s.build_plan, s.jtype, s.probe_keys,
                          s.build_keys, s.extra, null_aware=s.null_aware)

        if sel.sample is not None:
            plan = self._plan_sample(plan, sel.sample)

        # -- aggregation ------------------------------------------------------
        has_agg = bool(sel.group_by) or sel.group_by_all
        for e, _ in sel.select_list:
            if _contains_aggregate(e):
                has_agg = True
        if sel.having is not None:
            has_agg = True

        select_aliases = {}
        for e, alias in sel.select_list:
            if alias:
                select_aliases[alias.lower()] = e

        if has_agg:
            plan, post_binder, scope2 = self._plan_aggregate(
                plan, sel, scope, select_aliases, binder, ctes
            )
        else:
            post_binder = binder
            scope2 = scope

        # -- windows ----------------------------------------------------------
        windows: List[P.BoundWindow] = []

        def wcollector(wf, b):
            return self._bind_window_call(wf, b, windows)

        post_binder.window_collector = wcollector

        # -- projection -------------------------------------------------------
        items = []
        output = []
        unnest_specs = []  # (key, BoundExpr) — multiple unnests zip
        listpacks = []  # (key, [BoundExpr], LIST type)
        select_exprs = self._expand_stars(sel.select_list, scope)

        def hoist_listpacks(e):
            """Columnar list_value subtrees become eager ListPack nodes; the
            subtree is replaced with a reference the binder resolves via a
            synthetic scope entry. Constant list literals bind in place."""
            import dataclasses

            if not isinstance(e, N.Expr):
                return e
            if (isinstance(e, N.FunctionCall)
                    and e.name.lower() in ("list_value", "list_pack")
                    and e.args):
                new_args = [hoist_listpacks(a) for a in e.args]
                e2 = N.FunctionCall(e.name, new_args)
                try:
                    post_binder.bind(e2)
                    return e2
                except ValueError:
                    from duckdb_tpu.types import list_of as _list_of

                    bargs = [post_binder.bind(a) for a in new_args]
                    lt = _list_of(bargs[0].ltype)
                    lkey = self.fresh("listpack")
                    listpacks.append((lkey, bargs, lt))
                    ph = f"__lp{len(listpacks)}"
                    scope2.add(ph, ph, lkey, lt)
                    return N.ColumnRef((ph, ph))
            if not dataclasses.is_dataclass(e):
                return e
            kw = {}
            for f_ in dataclasses.fields(e):
                v = getattr(e, f_.name)
                if isinstance(v, N.Expr):
                    v = hoist_listpacks(v)
                elif isinstance(v, list):
                    v = [hoist_listpacks(x) if isinstance(x, N.Expr) else x
                         for x in v]
                elif isinstance(v, tuple):
                    v = tuple(hoist_listpacks(x) if isinstance(x, N.Expr)
                              else x for x in v)
                kw[f_.name] = v
            return type(e)(**kw)

        for e, alias in select_exprs:
            e = hoist_listpacks(e)
            if (isinstance(e, N.FunctionCall) and e.name.lower() == "unnest"
                    and len(e.args) == 1):
                ba = post_binder.bind(e.args[0])
                ukey = self.fresh("unnest")
                ct = ba.ltype.child or SQLNULL
                unnest_specs.append((ukey, ba))
                be = B.BoundColumnRef(ukey, ct)
            else:
                be = post_binder.bind(e)
            key = self.fresh("out")
            name = alias or _default_name(e)
            items.append((key, be))
            output.append((name, key, be.ltype))
        if sel.having is not None and has_agg:
            hb = post_binder.bind(sel.having)
            if isinstance(plan, P.Aggregate):
                # ungrouped pre-aggregation refs surviving the post-agg
                # binder are user errors (reference: "must appear in the
                # GROUP BY clause or be used in an aggregate function")
                allowed = {gk for gk, _ in plan.groups} \
                    | {a.key for a in plan.aggs}
                for nn in B.walk(hb):
                    if isinstance(nn, B.BoundColumnRef) \
                            and nn.key not in allowed:
                        raise BindError(
                            "Binder Error: HAVING column must appear in "
                            "the GROUP BY clause or be used in an "
                            "aggregate function")
            plan = P.Filter(plan, hb)
        qual_b = post_binder.bind(sel.qualify) if sel.qualify is not None else None
        if windows:
            plan = P.Window(plan, windows)
        if qual_b is not None:
            plan = P.Filter(plan, qual_b)
        for lkey, bargs, lt in listpacks:
            plan = P.ListPack(plan, bargs, lkey, lt)
        if unnest_specs:
            plan = P.Unnest(plan, [u[1] for u in unnest_specs],
                            [u[0] for u in unnest_specs])
        plan = P.Project(plan, items)

        if sel.distinct:
            plan = P.Aggregate(
                plan,
                [(k, B.BoundColumnRef(k, t)) for _, k, t in output],
                [],
            )
        out_scope = Scope()
        for nme, key, t in output:
            out_scope.add("", nme, key, t)
        self._last_select_aliases = select_aliases
        return plan, output, (out_scope, scope2, post_binder)

    def _expand_stars(self, select_list, scope: Scope):
        out = []
        hidden = getattr(scope, "star_hidden", ())
        for e, alias in select_list:
            if isinstance(e, N.Star):
                cols = (scope.columns_of(e.table) if e.table
                        else scope.all_columns())
                for a, c, b in cols:
                    if c.lower() in (x.lower() for x in e.exclude):
                        continue
                    if (str(a).lower(), c.lower()) in hidden and not e.table:
                        continue  # USING column: emitted once
                    out.append((N.ColumnRef((a, c)), c))
            else:
                out.append((e, alias))
        return out

    # -- aggregate planning ---------------------------------------------------
    def _plan_aggregate(self, plan, sel: N.SelectNode, scope, select_aliases,
                        binder, ctes):
        group_asts = []
        for g in sel.group_by:
            g = self._resolve_group_ast(g, sel, select_aliases)
            group_asts.append(g)
        if sel.group_by_all:
            for e, alias in sel.select_list:
                if not _contains_aggregate(e):
                    group_asts.append(e)

        groups: List[Tuple[str, B.BoundExpr]] = []
        group_lookup: List[Tuple[N.Expr, str, LogicalType]] = []
        for g in group_asts:
            bg = binder.bind(g)
            key = self.fresh("grp")
            groups.append((key, bg))
            group_lookup.append((g, key, bg.ltype))

        aggs: List[B.BoundAggregate] = []

        def collector(fc: N.FunctionCall, b):
            return self._bind_aggregate_call(fc, binder, aggs)

        post = _PostAggBinder(
            scope, group_lookup, collector,
            lambda e, b: self._bind_subquery_expr(e, b, ctes), binder)
        agg_node = P.Aggregate(plan, groups, aggs)
        return agg_node, post, scope

    def _resolve_group_ast(self, g, sel, select_aliases):
        if isinstance(g, N.Literal) and isinstance(g.value, int):
            idx = g.value - 1
            return sel.select_list[idx][0]
        if isinstance(g, N.ColumnRef) and len(g.parts) == 1:
            a = g.parts[0].lower()
            if a in select_aliases:
                return select_aliases[a]
        return g

    def _bind_aggregate_call(self, fc: N.FunctionCall, binder,
                             aggs: List[B.BoundAggregate]):
        name = fc.name.lower()
        if fc.filter is not None:
            # FILTER (WHERE p): agg(x) FILTER p ≡ agg(CASE WHEN p THEN x END)
            # (NULL inputs are ignored by every aggregate except count(*),
            # which rewrites to count(CASE WHEN p THEN 1 END))
            case = lambda a: N.CaseExpr(  # noqa: E731
                None, [(fc.filter, a)], None)
            if fc.is_star or not fc.args:
                fc = N.FunctionCall("count", [case(N.Literal(1))],
                                    distinct=fc.distinct,
                                    order_by=fc.order_by)
            else:
                fc = N.FunctionCall(fc.name, [case(fc.args[0])]
                                    + list(fc.args[1:]),
                                    distinct=fc.distinct,
                                    order_by=fc.order_by)
            name = fc.name.lower()
        if name == "count" and fc.is_star:
            func = "count_star"
            args = []
        else:
            func = {"mean": "avg", "group_concat": "string_agg",
                    "listagg": "string_agg",
                    "quantile": "quantile_disc",
                    "approx_quantile": "quantile_cont",
                    "arbitrary": "first", "argmax": "arg_max",
                    "argmin": "arg_min", "max_by": "arg_max",
                    "min_by": "arg_min", "favg": "avg", "fsum": "fsum",
                    "sumkahan": "fsum", "kahan_sum": "fsum",
                    "sum_no_overflow": "sum",
                    "reservoir_quantile": "quantile_disc",
                    # nulls_last variants: NULL by-values sort last, which
                    # the base arg_min/arg_max already do (NULL by ignored
                    # unless the group is all-NULL)
                    "arg_max_nulls_last": "arg_max",
                    "arg_min_nulls_last": "arg_min",
                    }.get(name, name)
            args = [binder.bind(a) for a in fc.args]
        _arity = {"arg_min": 2, "arg_max": 2, "arg_min_null": 2,
                  "arg_max_null": 2, "corr": 2, "covar_pop": 2,
                  "covar_samp": 2, "regr_slope": 2, "regr_intercept": 2,
                  "regr_r2": 2, "regr_count": 2, "regr_avgx": 2,
                  "regr_avgy": 2, "regr_sxx": 2, "regr_syy": 2,
                  "regr_sxy": 2}.get(func)
        if _arity is not None and len(args) != _arity:
            raise BindError(
                f"Binder Error: {func} requires {_arity} arguments, "
                f"{len(args)} given")
        if not args and func != "count_star":
            raise BindError(
                f"Binder Error: {func} requires at least one argument")
        if func == "string_agg" and args \
                and args[0].ltype.id is not TypeId.VARCHAR:
            # reference casts any argument to VARCHAR (string_agg.cpp)
            args[0] = B.BoundCast(args[0], VARCHAR)
        t = _agg_result_type(func, args)
        order_b = [(binder.bind(it.expr), it.descending, it.nulls_first)
                   for it in fc.order_by]
        # dedup structurally identical aggregates
        for a in aggs:
            if (a.func == func and a.distinct == fc.distinct
                    and not a.order_by and not order_b
                    and len(a.args) == len(args)
                    and all(_bound_eq(x, y) for x, y in zip(a.args, args))):
                return B.BoundAggregateRef(a.key, a.ltype)
        key = self.fresh(f"agg.{func}")
        agg = B.BoundAggregate(func, args, fc.distinct, t, key,
                               order_by=order_b)
        aggs.append(agg)
        return B.BoundAggregateRef(key, t)

    def _bind_window_call(self, wf, binder, windows: List[P.BoundWindow]):
        fc, spec = wf.func, wf.spec
        name = fc.name.lower()
        if name == "rank_dense":  # reference alias (function_list.cpp)
            name = "dense_rank"
        args = [binder.bind(a) for a in fc.args]
        part = [binder.bind(e) for e in spec.partition_by]
        order = [(binder.bind(it.expr), it.descending, it.nulls_first)
                 for it in spec.order_by]
        if name in ("row_number", "rank", "dense_rank", "ntile", "count"):
            t = BIGINT
        elif name == "sum":
            t = _agg_result_type("sum", args)
        elif name in ("avg", "mean"):
            t = DOUBLE
        elif name in ("min", "max", "lag", "lead", "first_value",
                      "last_value", "nth_value", "fill"):
            t = args[0].ltype if args else SQLNULL
        elif name in ("percent_rank", "cume_dist"):
            t = DOUBLE
        elif name in ("median", "quantile_cont", "stddev", "stddev_samp",
                      "stddev_pop", "var_samp", "var_pop", "variance"):
            t = DOUBLE
        else:
            raise BindError(f"window function {name} not supported")
        key = self.fresh(f"win.{name}")
        windows.append(P.BoundWindow(key, name, args, part, order, spec.frame, t))
        return B.BoundAggregateRef(key, t)

    # -- subquery flattening --------------------------------------------------
    def _flatten_conjunct(self, ast, scope, ctes, local_keys, bound_preds,
                          semis, atoms) -> bool:
        """Handle EXISTS / IN-subquery / correlated scalar-agg conjuncts."""
        neg = False
        inner = ast
        if isinstance(inner, N.NotExpr):
            neg = True
            inner = inner.child
        if isinstance(inner, N.Exists):
            negated = neg != inner.negated
            self._plan_semijoin_exists(inner.subquery, None, negated, scope,
                                       ctes, local_keys, semis)
            return True
        if isinstance(inner, N.InSubquery):
            negated = neg != inner.negated
            self._plan_semijoin_exists(inner.subquery, inner.expr, negated,
                                       scope, ctes, local_keys, semis)
            return True
        if isinstance(inner, N.BinaryOp) and inner.op in B._CMP_OPS and not neg:
            for e_side, other, flip in ((inner.right, inner.left, False),
                                        (inner.left, inner.right, True)):
                subs = _find_scalar_subqueries(e_side)
                if len(subs) == 1 and not _find_scalar_subqueries(other):
                    sq = subs[0]
                    sub_ref = self._correlated_scalar_ref(
                        sq.subquery, scope, ctes, local_keys, bound_preds,
                        atoms)
                    if sub_ref is None:
                        return False  # uncorrelated → normal binding path
                    # bind the containing expression with the subquery node
                    # replaced by the grouped-agg output column (handles
                    # e.g. `price > 1.2 * (SELECT avg(...) WHERE corr)`)

                    def sq_binder(e, b, _sq=sq, _ref=sub_ref):
                        if e is _sq:
                            return _ref
                        return self._bind_subquery_expr(e, b, ctes)

                    side_b = ExprBinder(scope,
                                        subquery_binder=sq_binder).bind(e_side)
                    other_b = self._pred_binder(scope, ctes).bind(other)
                    lhs, rhs = ((side_b, other_b) if flip
                                else (other_b, side_b))
                    bound_preds.append(B.BoundComparison(inner.op, lhs, rhs))
                    return True
        return False

    def _plan_sub_pool(self, sub: N.SelectStatement, scope, ctes, local_keys):
        """Plan a subquery's FROM/WHERE with correlation extraction.

        Returns (pool_atoms, local_bound, corr_eqs [(outer_e, inner_e)],
        corr_extra residual, sub_scope, sel_node).
        """
        if sub.ctes or sub.order_by or sub.limit:
            raise BindError("complex subquery (ctes/order/limit) unsupported")
        sel = sub.node
        if not isinstance(sel, N.SelectNode):
            raise BindError("set-op subquery unsupported")
        sub_scope = Scope(parent=scope)
        sub_atoms: List[Atom] = []
        pred_asts: List[N.Expr] = []
        self.collect_atoms(sel.from_table, ctes, sub_scope, sub_atoms, pred_asts)
        pred_asts = pred_asts + split_conjuncts(sel.where)
        pred_asts = [h for p in pred_asts for h in hoist_or_common(p)]
        sub_keys = set().union(*[a.keys for a in sub_atoms])
        binder = self._pred_binder(sub_scope, ctes)
        local_bound, corr_eqs, corr_extra = [], [], []
        sub_semis: List[SemiSpec] = []
        for ast in pred_asts:
            if self._flatten_conjunct(ast, sub_scope, ctes, sub_keys,
                                      local_bound, sub_semis, sub_atoms):
                continue
            bp = binder.bind(ast)
            ks = self._keys_of(bp)
            if ks <= sub_keys:
                local_bound.append(bp)
                continue
            # correlated: equality with one side fully-outer?
            if isinstance(bp, B.BoundComparison) and bp.op in ("=", "=="):
                kl, kr = self._keys_of(bp.left), self._keys_of(bp.right)
                if kl <= sub_keys and kr <= local_keys:
                    corr_eqs.append((bp.right, bp.left))
                    continue
                if kr <= sub_keys and kl <= local_keys:
                    corr_eqs.append((bp.left, bp.right))
                    continue
            corr_extra.append(bp)
        return (sub_atoms, local_bound, corr_eqs, corr_extra, sub_scope, sel,
                sub_semis)

    def _plan_semijoin_exists(self, sub, in_expr, negated, scope, ctes,
                              local_keys, semis):
        # grouped/complex subquery (Q18's IN ... GROUP BY ... HAVING): plan it
        # as a full standalone query and semi-join against its output column.
        sel0 = sub.node
        complex_sub = (
            not isinstance(sel0, N.SelectNode)
            or sel0.group_by or sel0.group_by_all or sel0.having is not None
            or sel0.distinct or sub.ctes or sub.order_by or sub.limit
            or any(_contains_aggregate(e) for e, _ in sel0.select_list)
        )
        if complex_sub and in_expr is not None:
            build, output = self.plan_select(sub, None, ctes)
            _, okey, ot = output[0]
            outer_b = self._pred_binder(scope, ctes).bind(in_expr)
            semis.append(SemiSpec(
                "anti" if negated else "semi", build, [outer_b],
                [B.BoundColumnRef(okey, ot)], None,
                null_aware=negated,
            ))
            return
        (sub_atoms, local_bound, corr_eqs, corr_extra, sub_scope,
         sel, sub_semis) = self._plan_sub_pool(sub, scope, ctes, local_keys)
        build = self.plan_pool(sub_atoms, local_bound)
        for ss in sub_semis:
            build = P.Join(build, ss.build_plan, ss.jtype, ss.probe_keys,
                           ss.build_keys, ss.extra, null_aware=ss.null_aware)
        probe_keys = [o for o, i in corr_eqs]
        build_keys = [i for o, i in corr_eqs]
        if in_expr is not None:
            # IN: add expr = select-item equality
            if len(sel.select_list) != 1:
                raise BindError("IN subquery must select one column")
            item_ast = sel.select_list[0][0]
            inner_b = self._pred_binder(sub_scope, ctes).bind(item_ast)
            outer_b = self._pred_binder(scope, ctes).bind(in_expr)
            if inner_b.ltype != outer_b.ltype:
                # mixed-type IN: both sides coerce to the common
                # comparison type (raises a typed binder error when
                # incomparable; bad strings raise Conversion at runtime)
                mt = max_logical_type(outer_b.ltype, inner_b.ltype)
                if outer_b.ltype != mt:
                    outer_b = B.BoundCast(outer_b, mt)
                if inner_b.ltype != mt:
                    inner_b = B.BoundCast(inner_b, mt)
            probe_keys.append(outer_b)
            build_keys.append(inner_b)
        if in_expr is None:
            spec = self._try_neq_exists_rewrite(build, corr_eqs, corr_extra,
                                                negated, local_keys)
            if spec is not None:
                semis.append(spec)
                return
        extra = (B.BoundConjunction("and", corr_extra) if corr_extra else None)
        if not probe_keys:
            # uncorrelated EXISTS: semi/anti join on a constant key — every
            # probe row matches iff the build side is non-empty (reference
            # plans this as a MARK join over a constant,
            # src/planner/binder/query_node/plan_subquery.cpp)
            one = BIGINT
            probe_keys.append(B.BoundLiteral(1, one))
            build_keys.append(B.BoundLiteral(1, one))
        semis.append(SemiSpec("anti" if negated else "semi", build,
                              probe_keys, build_keys, extra,
                              null_aware=negated and in_expr is not None))

    def _try_neq_exists_rewrite(self, build, corr_eqs, corr_extra,
                                negated, local_keys):
        """EXISTS(... k = outer.k AND c <> outer.c) → semi/anti join
        against GROUP BY k: min(c), max(c) with extra
        (min <> outer.c OR max <> outer.c).

        `exists row in group with c ≠ a` ⟺ `min(c) ≠ a OR max(c) ≠ a`
        (NULL c values are ignored by min/max exactly as `c <> a` is
        never TRUE for them). The aggregate build has unique keys by
        construction, so the probe fuses into the aggregate pipeline —
        the TPC-H q21 wait-for-another-supplier shape. The reference
        plans this as a MARK join with a duplicate-key hash table
        (plan_subquery.cpp); a unique build + min/max predicate is the
        TPU-native equivalent (no expansion, one gather)."""
        if not corr_eqs or len(corr_extra) != 1:
            return None
        bp = corr_extra[0]
        if not (isinstance(bp, B.BoundComparison) and bp.op in ("<>", "!=")):
            return None
        kl, kr = self._keys_of(bp.left), self._keys_of(bp.right)
        sub_keys = set()
        for _, i in corr_eqs:
            sub_keys |= self._keys_of(i)
        # identify which side is inner: its keys must NOT be outer keys
        if kl and not (kl & local_keys):
            inner_c, outer_c = bp.left, bp.right
        elif kr and not (kr & local_keys):
            inner_c, outer_c = bp.right, bp.left
        else:
            return None
        if self._keys_of(outer_c) & self._keys_of(inner_c):
            return None
        groups, build_keys = [], []
        for _, i in corr_eqs:
            gk = self.fresh("neqg")
            groups.append((gk, i))
            build_keys.append(B.BoundColumnRef(gk, i.ltype))
        kmin, kmax = self.fresh("neqmin"), self.fresh("neqmax")
        aggs = [B.BoundAggregate("min", [inner_c], False, inner_c.ltype,
                                 kmin),
                B.BoundAggregate("max", [inner_c], False, inner_c.ltype,
                                 kmax)]
        agg_build = P.Aggregate(build, groups, aggs)
        mn = B.BoundColumnRef(kmin, inner_c.ltype)
        mx = B.BoundColumnRef(kmax, inner_c.ltype)
        extra = B.BoundConjunction("or", [
            B.BoundComparison("<>", mn, outer_c),
            B.BoundComparison("<>", mx, outer_c)])
        probe_keys = [o for o, _ in corr_eqs]
        return SemiSpec("anti" if negated else "semi", agg_build,
                        probe_keys, build_keys, extra)

    def _correlated_scalar_ref(self, sub, scope, ctes, local_keys,
                               bound_preds, atoms):
        """`(SELECT agg-expr FROM ... WHERE corr)` → grouped-aggregate atom
        equi-joined on the correlation keys; returns a BoundColumnRef over
        its output (None if not a flattenable correlated scalar agg).
        Reference: FlattenDependentJoins,
        src/planner/subquery/flatten_dependent_join.cpp."""
        try:
            (sub_atoms, local_bound, corr_eqs, corr_extra, sub_scope,
             sel, sub_semis) = self._plan_sub_pool(sub, scope, ctes, local_keys)
        except BindError:
            return None
        if not corr_eqs or corr_extra:
            return None
        if len(sel.select_list) != 1 or sel.group_by or sel.having:
            return None
        item_ast = sel.select_list[0][0]
        if not _contains_aggregate(item_ast):
            return None
        subplan = self.plan_pool(sub_atoms, local_bound)
        for ss in sub_semis:
            subplan = P.Join(subplan, ss.build_plan, ss.jtype, ss.probe_keys,
                             ss.build_keys, ss.extra,
                             null_aware=ss.null_aware)
        sub_binder = self._pred_binder(sub_scope, ctes)
        # group by the inner correlation expressions
        groups = []
        group_lookup = []
        for outer_e, inner_e in corr_eqs:
            key = self.fresh("corr")
            groups.append((key, inner_e))
            group_lookup.append((None, key, inner_e.ltype))
        aggs: List[B.BoundAggregate] = []

        def collector(fc, b):
            return self._bind_aggregate_call(fc, sub_binder, aggs)

        post = ExprBinder(
            sub_scope, agg_collector=collector,
            subquery_binder=lambda e, b: self._bind_subquery_expr(e, b, ctes))
        item_b = post.bind(item_ast)
        agg_plan = P.Aggregate(subplan, groups, aggs)
        out_key = self.fresh("subagg")
        agg_plan = P.Project(agg_plan, [(out_key, item_b)])
        # register as atom joined on correlation keys
        aid = 50_000 + len(atoms)
        keys = {out_key} | {k for k, _ in groups}
        atom = Atom(aid, agg_plan, 10_000, keys)
        for k in keys:
            self.key_owner[k] = aid
        atoms.append(atom)
        for (outer_e, inner_e), (gkey, _) in zip(corr_eqs, groups):
            bound_preds.append(B.BoundComparison(
                "=", outer_e, B.BoundColumnRef(gkey, inner_e.ltype)))
        return B.BoundColumnRef(out_key, item_b.ltype)

    # -- order ---------------------------------------------------------------
    def _plan_order(self, plan, order_items, output, scope_info):
        out_scope, pre_scope, post_binder = scope_info
        items = []
        for it in order_items:
            e = it.expr
            be = None
            if isinstance(e, N.Literal) and isinstance(e.value, int):
                _, key, t = output[e.value - 1]
                be = B.BoundColumnRef(key, t)
            elif isinstance(e, N.ColumnRef) and len(e.parts) == 1:
                b = out_scope.try_resolve(e.parts)
                if b is not None:
                    be = B.BoundColumnRef(b.key, b.ltype)
            if be is None:
                be = post_binder.bind(e)
            items.append((be, it.descending, it.nulls_first))
        return P.Order(plan, items)


def _ref_alias(ref) -> Optional[str]:
    if isinstance(ref, N.BaseTableRef):
        return (ref.alias or ref.name).lower()
    alias = getattr(ref, "alias", None)
    return alias.lower() if alias else None


class _ConstantRow(P.PlanNode):
    """SELECT without FROM: one live row, no columns."""


def _find_scalar_subqueries(e) -> list:
    """Collect ScalarSubquery nodes in an expression (not descending into
    the subqueries themselves)."""
    import dataclasses as _dc

    if isinstance(e, N.ScalarSubquery):
        return [e]
    out = []
    if _dc.is_dataclass(e) and not isinstance(e, type):
        for f in _dc.fields(e):
            v = getattr(e, f.name)
            if isinstance(v, N.Expr):
                out += _find_scalar_subqueries(v)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if isinstance(x, N.Expr):
                        out += _find_scalar_subqueries(x)
    return out


def _contains_aggregate(e: N.Expr) -> bool:
    if isinstance(e, N.WindowFunction):
        # a windowed aggregate is not a GROUP BY aggregate (unless its args
        # contain one, e.g. sum(sum(x)) OVER — check args only)
        return any(_contains_aggregate(a) for a in e.func.args)
    if isinstance(e, N.FunctionCall):
        if e.name.lower() in AGGREGATE_NAMES or e.is_star:
            return True
        return any(_contains_aggregate(a) for a in e.args)
    for f_name in getattr(e, "__dataclass_fields__", {}):
        v = getattr(e, f_name)
        if isinstance(v, N.Expr) and _contains_aggregate(v):
            return True
        if isinstance(v, list):
            for x in v:
                if isinstance(x, N.Expr) and _contains_aggregate(x):
                    return True
                if isinstance(x, tuple):
                    for y in x:
                        if isinstance(y, N.Expr) and _contains_aggregate(y):
                            return True
    return False


def _bound_eq(a: B.BoundExpr, b: B.BoundExpr) -> bool:
    if type(a) is not type(b):
        return False
    if isinstance(a, B.BoundColumnRef):
        return a.key == b.key
    if isinstance(a, B.BoundLiteral):
        return a.value == b.value and a.ltype == b.ltype
    ca, cb = a.children(), b.children()
    if len(ca) != len(cb):
        return False
    core_a = {k: v for k, v in a.__dict__.items()
              if not isinstance(v, (B.BoundExpr, list))}
    core_b = {k: v for k, v in b.__dict__.items()
              if not isinstance(v, (B.BoundExpr, list))}
    if core_a != core_b:
        return False
    return all(_bound_eq(x, y) for x, y in zip(ca, cb))


def _agg_result_type(func: str, args) -> LogicalType:
    from duckdb_tpu.execution.aggregate_stats import STAT_AGGS
    if func in ("count", "count_star", "approx_count_distinct"):
        return BIGINT
    if func in STAT_AGGS:
        if func in ("regr_count", "count_if", "countif"):
            return BIGINT
        return DOUBLE
    if func == "fsum":
        return DOUBLE
    t = args[0].ltype if args else SQLNULL
    if func == "sum":
        if t.id is TypeId.DECIMAL:
            return decimal(38, t.scale)
        if t.is_float:
            return DOUBLE
        if t.is_integer or t.id is TypeId.HUGEINT or t.id is TypeId.BOOLEAN:
            # reference promotes every integer sum to HUGEINT with exact
            # 128-bit accumulation (core_functions/aggregate/distributive/
            # sum.cpp); here the (lo, hi) wide-sum planes carry the value
            from duckdb_tpu.types import HUGEINT as _HI
            return _HI
        return BIGINT
    if func in ("avg", "mean"):
        return DOUBLE
    if func in ("min", "max", "first", "last", "any_value", "arg_min",
                "arg_max", "arg_min_null", "arg_max_null", "mode",
                "quantile_disc"):
        return t
    if func == "approx_top_k":
        from duckdb_tpu.types import list_of as _list_of

        return _list_of(t)
    if func == "bitstring_agg":
        from duckdb_tpu.types import VARCHAR as _VC

        return _VC  # BIT carrier
    if func == "histogram_exact":
        from duckdb_tpu.types import map_of as _map_of

        return _map_of(t, BIGINT)
    if func == "lttb":
        from duckdb_tpu.types import list_of as _list_of, struct_of as _so

        return _list_of(_so(("x", t), ("y", DOUBLE)))
    if func in ("median", "quantile", "quantile_cont", "approx_quantile"):
        return t if t.id is TypeId.VARCHAR else DOUBLE
    if func == "product":
        return DOUBLE
    if func == "string_agg":
        from duckdb_tpu.types import VARCHAR as _VC

        return _VC
    if func in ("list", "array_agg"):
        from duckdb_tpu.types import list_of as _list_of

        return _list_of(t)
    if func == "histogram":
        from duckdb_tpu.types import map_of as _map_of

        return _map_of(t, BIGINT)
    if func in ("bit_and", "bit_or", "bit_xor"):
        return t
    if func in ("stddev", "stddev_samp", "stddev_pop", "var_samp", "var_pop",
                "variance"):
        return DOUBLE
    if func in ("bool_and", "bool_or"):
        return BOOLEAN
    raise BindError(f"unknown aggregate {func}")


class _PostAggBinder(ExprBinder):
    """Binds select/having/order expressions after aggregation.

    Subtrees matching a GROUP BY expression become refs to the group output;
    aggregate calls route to the collector; anything else must resolve
    through group keys (else it's an ungrouped-column error).
    """

    def __init__(self, scope, group_lookup, collector, subquery_binder,
                 pre_binder):
        super().__init__(scope, agg_collector=collector,
                         subquery_binder=subquery_binder)
        self.group_lookup = group_lookup
        self.pre_binder = pre_binder

    def bind(self, e: N.Expr) -> B.BoundExpr:
        for ast, key, t in self.group_lookup:
            if ast is not None and _ast_eq(ast, e, self.scope):
                return B.BoundColumnRef(key, t)
        return super().bind(e)


def _ast_eq(a: N.Expr, b: N.Expr, scope: Scope) -> bool:
    if isinstance(a, N.ColumnRef) and isinstance(b, N.ColumnRef):
        ba = scope.try_resolve(a.parts)
        bb = scope.try_resolve(b.parts)
        return ba is not None and bb is not None and ba.key == bb.key
    return a == b


def _default_name(e: N.Expr) -> str:
    if isinstance(e, N.ColumnRef):
        return e.parts[-1]
    if isinstance(e, N.FunctionCall):
        return e.name.lower()
    if isinstance(e, N.CastExpr):
        return _default_name(e.child)
    return "expr"


def plan_select(catalog, stmt: N.SelectStatement):
    p = Planner(catalog)
    return p.plan_select(stmt)
