"""Declarative settings registry.

The reference generates its settings surface from one JSON file
(/root/reference/src/common/settings.json → scripts/generate_settings.py,
180 entries, global vs session scope). Same pattern: one table drives
SET/RESET/PRAGMA and the duckdb_settings() system function.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional


@dataclass
class Setting:
    name: str
    default: object
    typ: str  # BOOLEAN / BIGINT / VARCHAR / DOUBLE
    scope: str  # GLOBAL / LOCAL
    description: str


SETTINGS = [
    Setting("threads", 0, "BIGINT", "GLOBAL",
            "Host threads for native loaders (0 = hardware concurrency)"),
    Setting("memory_limit", "80% of HBM", "VARCHAR", "GLOBAL",
            "Device memory budget for resident columns"),
    Setting("enable_progress_bar", False, "BOOLEAN", "LOCAL",
            "Show progress for long queries"),
    Setting("enable_profiling", False, "BOOLEAN", "LOCAL",
            "Collect per-operator timings (EXPLAIN ANALYZE implies it)"),
    Setting("explain_output", "physical_only", "VARCHAR", "LOCAL",
            "EXPLAIN rendering mode"),
    Setting("default_null_order", "nulls_last", "VARCHAR", "LOCAL",
            "Default NULL ordering for ORDER BY"),
    Setting("default_order", "asc", "VARCHAR", "LOCAL",
            "Default sort direction"),
    Setting("temp_directory", "", "VARCHAR", "GLOBAL",
            "Directory for out-of-core spill files (empty = system temp; "
            "reference: temporary_file_manager.cpp)"),
    Setting("num_shards", 0, "BIGINT", "GLOBAL",
            "Device-mesh shards for distributed execution (0 = auto: all "
            "visible devices when the working set exceeds auto_shard_rows; "
            "1 = single chip)"),
    Setting("auto_shard_rows", 1 << 15, "BIGINT", "GLOBAL",
            "Row count above which auto sharding (num_shards = 0) "
            "distributes operators over the device mesh"),
    Setting("disabled_optimizers", "", "VARCHAR", "LOCAL",
            "Comma-separated optimizer passes to skip"),
    Setting("join_order", "dp", "VARCHAR", "LOCAL",
            "Join order enumeration: 'dp' (cardinality-costed dynamic "
            "program, reference src/optimizer/join_order/) or 'greedy'"),
    Setting("max_expression_depth", 1000, "BIGINT", "LOCAL",
            "Parser recursion guard"),
    Setting("timezone", "UTC", "VARCHAR", "LOCAL", "Session time zone"),
    Setting("preserve_insertion_order", True, "BOOLEAN", "GLOBAL",
            "Stable result ordering for unordered queries"),
    Setting("checkpoint_threshold", "16MB", "VARCHAR", "GLOBAL",
            "WAL size that triggers automatic checkpoint"),
    Setting("enable_object_cache", True, "BOOLEAN", "GLOBAL",
            "Cache compiled query programs"),
    Setting("exchange_join_threshold", 1 << 24, "BIGINT", "GLOBAL",
            "Dense-table size above which multi-shard joins repartition "
            "via all_to_all exchange instead of replicating the build "
            "(0 = always exchange when num_shards > 1)"),
    Setting("pallas_grouped_sum", "auto", "VARCHAR", "GLOBAL",
            "Exact int64 grouped sums via the Pallas limb-matmul MXU "
            "kernel: 'auto' (on for TPU backends), 'on', 'off'"),
    Setting("experimental_join_fusion", False, "BOOLEAN", "GLOBAL",
            "Fuse dense unique inner joins into aggregate programs "
            "(constant-capture prototype; see fused_agg._JoinPrep)"),
    # fault-injection hooks (reference: debug_* settings in
    # src/common/settings.json; crash-consistency test harness)
    Setting("debug_checkpoint_abort", "none", "VARCHAR", "GLOBAL",
            "Abort CHECKPOINT at a stage: none | before_data | "
            "before_header | before_truncate (crash-recovery testing)"),
    Setting("debug_force_commit_failure", False, "BOOLEAN", "GLOBAL",
            "Force every explicit COMMIT to fail after validation "
            "(rollback-path testing)"),
    # accepted-for-compatibility knobs (single storage format / macro
    # dependency tracking not applicable here; reference settings.json)
    Setting("storage_compatibility_version", "latest", "VARCHAR", "GLOBAL",
            "Accepted for reference compatibility (single format)"),
    Setting("enable_macro_dependencies", False, "BOOLEAN", "GLOBAL",
            "Accepted for reference compatibility (macros expand at bind "
            "time; no dependency tracking needed)"),
]

from duckdb_tpu.main.settings_compat import (  # noqa: E402
    COMPAT_SETTINGS, SETTING_ALIASES)

SETTINGS += [Setting(n, d, t, sc, desc + " (accepted for reference "
                     "compatibility; no engine effect)")
             for n, d, t, sc, desc in COMPAT_SETTINGS]

BY_NAME: Dict[str, Setting] = {s.name: s for s in SETTINGS}


def parse_bytes(v) -> int:
    """'512MB' / '2GiB' / int → bytes (0 = unlimited)."""
    if isinstance(v, (int, float)):
        return int(v)
    if str(v).strip().lower() == "80% of hbm":
        # the default: 80% of the accelerator's memory. The tunneled
        # runtime reports no memory_stats, so fall back to the v5e's
        # 16 GiB HBM; CPU backends run unlimited (host RAM is the pool)
        try:
            import jax

            d = jax.devices()[0]
            stats = getattr(d, "memory_stats", lambda: None)()
            if stats and stats.get("bytes_limit"):
                return int(stats["bytes_limit"] * 0.8)
            if d.platform != "cpu":
                return int((16 << 30) * 0.8)
        except Exception:  # noqa: BLE001 — backend probing is best-effort
            pass
        return 0
    s_ = str(v).strip().upper().replace("IB", "B")
    mult = 1
    for suffix, m in (("TB", 1 << 40), ("GB", 1 << 30), ("MB", 1 << 20),
                      ("KB", 1 << 10), ("B", 1)):
        if s_.endswith(suffix):
            s_ = s_[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(s_) * mult)
    except ValueError:
        raise ValueError(f'Failed to parse memory limit "{v}": expected a '
                         'size like \'1GB\' (0 = unlimited)')


class SettingsManager:
    def __init__(self):
        self.values: Dict[str, object] = {s.name: s.default for s in SETTINGS}
        # apply the default memory budget at startup (SET only re-applies)
        from duckdb_tpu.catalog.catalog import POOL, set_memory_limit

        if not POOL.limit:
            try:
                set_memory_limit(parse_bytes(self.values["memory_limit"]))
            except Exception:  # noqa: BLE001 — budget probing best-effort
                pass

    @staticmethod
    def _canon(name: str) -> str:
        name = name.lower()
        if name in BY_NAME:
            return name
        return SETTING_ALIASES.get(name, name)

    def set(self, name: str, value):
        name = self._canon(name)
        if name not in BY_NAME:
            raise ValueError(
                f'unrecognized configuration parameter "{name}"')
        spec = BY_NAME[name]
        if spec.typ == "BOOLEAN" and isinstance(value, str):
            value = value.lower() in ("true", "on", "1")
        elif spec.typ == "BIGINT":
            value = int(value)
        self.values[name] = value
        if name == "memory_limit":
            from duckdb_tpu.catalog.catalog import set_memory_limit

            set_memory_limit(parse_bytes(value))
        elif name == "pallas_grouped_sum":
            from duckdb_tpu.ops import pallas_agg

            mode = str(value).lower()
            if mode not in ("auto", "on", "off"):
                raise ValueError(
                    "pallas_grouped_sum must be 'auto', 'on', or 'off'")
            pallas_agg.MODE = mode

    def reset(self, name: str):
        name = self._canon(name)
        if name in BY_NAME:
            self.values[name] = BY_NAME[name].default

    def get(self, name: str, default=None):
        return self.values.get(self._canon(name), default)

    def rows(self):
        return [(s.name, str(self.values[s.name]), s.description, s.typ,
                 s.scope) for s in SETTINGS]
