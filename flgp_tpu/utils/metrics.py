"""Structured per-stage metrics and wall-clock instrumentation.

The reference's observability is Rcout stage banners (src/Fit.cpp:26-81);
here every pipeline stage can record wall-clock, sizes, and solver residuals
into a structured report, and ``jax.profiler`` traces can wrap any scope.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, Optional

import jax


@dataclass
class StageMetrics:
    name: str
    wall_s: float
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class MetricsReport:
    stages: list = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, **extra) -> Iterator[Dict[str, Any]]:
        """Time a stage; the yielded dict collects extra metrics.

        Blocks on async dispatch at scope exit so timings are honest."""
        slot: Dict[str, Any] = dict(extra)
        t0 = time.perf_counter()
        try:
            yield slot
        finally:
            sync = slot.pop("_sync", None)
            if sync is not None:
                jax.block_until_ready(sync)
            self.stages.append(StageMetrics(name, time.perf_counter() - t0, slot))

    def to_json(self) -> str:
        return json.dumps(
            [
                {"stage": s.name, "wall_s": round(s.wall_s, 6), **s.extra}
                for s in self.stages
            ]
        )

    def total(self) -> float:
        return sum(s.wall_s for s in self.stages)


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]) -> Iterator[None]:
    """Wrap a scope in a jax.profiler trace when logdir is set, else no-op."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
