"""Structured logging subsystem.

Reference: src/logging/ — LogManager with ring LogStorage queryable via
duckdb_logs(); DUCKDB_LOG_* macros. Here: a bounded ring of structured
entries; the engine logs query lifecycle, checkpoints, and WAL replay;
`SELECT * FROM duckdb_logs()` exposes them.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass
from typing import Deque

LEVELS = ("TRACE", "DEBUG", "INFO", "WARN", "ERROR")


@dataclass
class LogEntry:
    ts: float
    level: str
    log_type: str
    message: str


class LogManager:
    def __init__(self, capacity: int = 4096):
        self.entries: Deque[LogEntry] = deque(maxlen=capacity)
        self.min_level = "INFO"

    def log(self, level: str, log_type: str, message: str):
        if LEVELS.index(level) >= LEVELS.index(self.min_level):
            self.entries.append(LogEntry(time.time(), level, log_type,
                                         message))

    def info(self, log_type, message):
        self.log("INFO", log_type, message)

    def debug(self, log_type, message):
        self.log("DEBUG", log_type, message)

    def warn(self, log_type, message):
        self.log("WARN", log_type, message)

    def error(self, log_type, message):
        self.log("ERROR", log_type, message)

    def rows(self):
        import datetime

        return [(datetime.datetime.fromtimestamp(e.ts).isoformat(sep=" ",
                                                                 timespec="milliseconds"),
                 e.level, e.log_type, e.message) for e in self.entries]
