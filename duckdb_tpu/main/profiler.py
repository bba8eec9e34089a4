"""Query profiler: per-phase and per-operator timing + cardinalities.

Reference: QueryProfiler / OperatorProfiler
(/root/reference/src/main/query_profiler.cpp — phase timers collected in
client_context.cpp:488-530, per-operator tree render). Device work is
async under JAX, so operator wall times here include dispatch plus any
blocking sync the operator performs — the numbers that actually matter
for the host-driven execution model.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class OperatorProfile:
    name: str
    detail: str = ""
    time_s: float = 0.0
    cardinality: int = -1
    children: List["OperatorProfile"] = field(default_factory=list)

    def render(self, indent=0) -> str:
        pad = "  " * indent
        card = f", {self.cardinality} rows" if self.cardinality >= 0 else ""
        lines = [f"{pad}{self.name}{self.detail} ({self.time_s*1000:.2f} ms{card})"]
        for c in self.children:
            lines.append(c.render(indent + 1))
        return "\n".join(lines)

    def to_json(self):
        return {
            "name": self.name, "detail": self.detail,
            "time_ms": round(self.time_s * 1000, 3),
            "cardinality": self.cardinality,
            "children": [c.to_json() for c in self.children],
        }


@dataclass
class QueryProfile:
    query: str = ""
    phases: Dict[str, float] = field(default_factory=dict)
    root: Optional[OperatorProfile] = None
    total_s: float = 0.0

    def render(self) -> str:
        out = ["┌─────────────────────────────────────┐",
               "│         Query Profiling Result      │",
               "└─────────────────────────────────────┘",
               self.query.strip(), ""]
        out.append(f"Total Time: {self.total_s*1000:.2f} ms")
        for ph, t in self.phases.items():
            out.append(f"  {ph}: {t*1000:.2f} ms")
        if self.root is not None:
            out.append("")
            out.append(self.root.render())
        return "\n".join(out)

    def to_json(self) -> str:
        return json.dumps({
            "query": self.query,
            "total_ms": round(self.total_s * 1000, 3),
            "phases": {k: round(v * 1000, 3) for k, v in self.phases.items()},
            "plan": self.root.to_json() if self.root else None,
        }, indent=2)


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt


def profile_executor(executor, profile: QueryProfile):
    """Wrap an Executor so each plan-node execution is timed into a tree."""
    inner_execute = executor.execute
    stack: List[OperatorProfile] = []

    def traced_execute(node):
        op = OperatorProfile(type(node).__name__)
        if stack:
            stack[-1].children.insert(0, op)
        else:
            profile.root = op
        stack.append(op)
        t0 = time.perf_counter()
        try:
            batch = inner_execute(node)
        finally:
            op.time_s = time.perf_counter() - t0
            stack.pop()
        try:
            op.cardinality = batch.count_live()
            op.time_s = time.perf_counter() - t0  # include the sync
        except Exception:
            pass
        return batch

    executor.execute = traced_execute
    return executor
