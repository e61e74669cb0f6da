"""Tracing and structured metrics (SURVEY.md §5.1: absent in the reference).

Three small tools:

* ``trace(name)`` — context manager adding a ``jax.profiler`` TraceAnnotation
  (visible in TPU profiles) and wall-clock timing;
* ``StageTimer`` — accumulates per-stage wall times across a run (decode /
  ground / search / qa), reportable as a dict;
* ``MetricsLogger`` — append-only JSONL sink for structured run metrics
  (replaces the reference's bare prints/tqdm).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            with trace(name):
                yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(1, self.counts[name]), 4),
            }
            for name in sorted(self.totals)
        }


class MetricsLogger:
    """Append-only JSONL metrics sink."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, record: Dict) -> None:
        record = dict(record, ts=time.time())
        if self.path:
            with open(self.path, "a", encoding="utf-8") as f:
                json.dump(record, f, ensure_ascii=False)
                f.write("\n")


def start_device_profile(logdir: str) -> None:
    """Capture a TPU profile (view with tensorboard/xprof)."""
    import jax.profiler

    jax.profiler.start_trace(logdir)


def stop_device_profile() -> None:
    import jax.profiler

    jax.profiler.stop_trace()
