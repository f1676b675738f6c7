"""Structured metrics/observability (SURVEY.md §5 "Metrics / logging" row).

The reference has nothing beyond stdout; the rebuild tracks per-run counters
and gauges (reads/s, cells/s, skipped reads, padding waste) and can emit them
as JSONL for dashboards.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional, TextIO


class Metrics:
    def __init__(self):
        self.counters: Dict[str, float] = {}
        self.gauges: Dict[str, float] = {}
        self.t0 = time.time()

    def count(self, name: str, inc: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + inc

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = value

    def snapshot(self) -> dict:
        return {
            "elapsed_s": round(time.time() - self.t0, 3),
            "counters": dict(self.counters),
            "gauges": {k: round(v, 4) for k, v in self.gauges.items()},
        }

    def report(self, stream: Optional[TextIO] = None) -> None:
        stream = stream or sys.stderr
        print(f"[metrics] {json.dumps(self.snapshot())}", file=stream)

    def write_jsonl(self, path: str) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(self.snapshot()) + "\n")
