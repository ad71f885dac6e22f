"""Lightweight per-stage metrics collection for pipeline runs.

The reference only has throttled progress logging
(``/root/reference/runner.py:22, 41-84``); the engine records structured
per-stage wall times + row counts that flow into the checkpoint manifest
(north_rule: per-partition lineage + metrics) and into bench output.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class StageMetrics:
    def __init__(self):
        self.stages: dict[str, dict] = {}

    @contextmanager
    def timed(self, stage: str, **extra):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            rec = self.stages.setdefault(stage, {"wall_s": 0.0, "calls": 0})
            rec["wall_s"] += time.perf_counter() - t0
            rec["calls"] += 1
            rec.update(extra)

    def add(self, stage: str, **fields):
        self.stages.setdefault(stage, {}).update(fields)

    def as_dict(self) -> dict:
        return {k: dict(v) for k, v in self.stages.items()}
