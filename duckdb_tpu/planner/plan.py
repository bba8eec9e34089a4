"""Plan operator tree.

The reference lowers LogicalOperator → PhysicalOperator
(/root/reference/src/execution/physical_plan_generator.cpp). Here one tree
serves both roles: each node is executed as whole-block XLA programs by
duckdb_tpu/execution/executor.py; there is no pull/push interpreter to
lower into — the "physical" representation is the traced jnp graph itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from duckdb_tpu.planner.bound import BoundAggregate, BoundExpr
from duckdb_tpu.types import LogicalType


class PlanNode:
    pass


@dataclass
class Scan(PlanNode):
    table: str
    alias: str
    # colname → key mapping (keys are f"{alias}.{col}")
    cols: List[Tuple[str, str, LogicalType]]  # (colname, key, type)


@dataclass
class Filter(PlanNode):
    child: PlanNode
    expr: BoundExpr


@dataclass
class Project(PlanNode):
    child: PlanNode
    items: List[Tuple[str, BoundExpr]]  # (output key, expr)


@dataclass
class Aggregate(PlanNode):
    child: PlanNode
    groups: List[Tuple[str, BoundExpr]]  # (output key, expr)
    aggs: List[BoundAggregate]


@dataclass
class Join(PlanNode):
    probe: PlanNode  # "left" side of SQL semantics after planner normalization
    build: PlanNode
    jtype: str  # inner / left / full / semi / anti / single
    probe_keys: List[BoundExpr]
    build_keys: List[BoundExpr]
    # residual ON predicate over combined (probe ∪ build) columns
    extra: Optional[BoundExpr] = None
    # NOT IN semantics: NULL probe keys never pass; any NULL build key
    # empties the anti result (reference: MARK join, physical_hash_join)
    null_aware: bool = False


@dataclass
class CrossJoin(PlanNode):
    probe: PlanNode
    build: PlanNode


@dataclass
class BoundWindow:
    key: str  # output binding
    func: str  # row_number/rank/dense_rank/sum/avg/min/max/count/lag/lead/...
    args: List[BoundExpr]
    partition_by: List[BoundExpr]
    order_by: List[Tuple[BoundExpr, bool, Optional[bool]]]  # (expr, desc, nulls_first)
    frame: Optional[Tuple[str, tuple, tuple]]  # (mode, start, end) or None
    ltype: "LogicalType" = None


@dataclass
class Window(PlanNode):
    child: PlanNode
    windows: List[BoundWindow]


@dataclass
class Order(PlanNode):
    child: PlanNode
    items: List[Tuple[BoundExpr, bool, Optional[bool]]]  # (expr, desc, nulls_first)


@dataclass
class Limit(PlanNode):
    child: PlanNode
    n: Optional[int]
    offset: int = 0


@dataclass
class Unnest(PlanNode):
    """Flatten LIST expressions to rows; multiple unnests zip by position
    with NULL padding; sibling columns replicate (reference:
    src/execution/operator/projection/physical_unnest.cpp)."""

    child: PlanNode
    exprs: list  # BoundExprs of LIST type
    keys: list  # output column keys, one per expr


@dataclass
class ListPack(PlanNode):
    """Columnar list construction: one LIST value per row from N column
    expressions (reference: list_value.cpp over vectors). Eager node — the
    variable-width host encode happens outside any trace."""

    child: PlanNode
    exprs: list  # BoundExprs, one per element position
    key: str
    ltype: object  # LIST LogicalType


@dataclass
class PositionalJoin(PlanNode):
    """Row-by-row zip of two relations; the shorter side pads with NULLs
    (reference: physical_positional_join.cpp)."""

    left: PlanNode
    right: PlanNode


@dataclass
class Sample(PlanNode):
    """Pseudo-random row sample (reference: src/execution/operator/helper/
    physical_reservoir_sample.cpp). rows XOR percent is set."""

    child: PlanNode
    rows: Optional[int] = None
    percent: Optional[float] = None
    method: Optional[str] = None
    seed: Optional[int] = None


@dataclass
class SetOp(PlanNode):
    op: str  # union_all (union/except/intersect lower to agg/semi/anti joins)
    left: PlanNode
    right: PlanNode
    keys: List[Tuple[str, LogicalType]] = field(default_factory=list)
