"""Profiling / observability helpers.

Capability parity with the reference's operational tooling (SURVEY §5): the
torch side used Lightning's `profiler="simple"` (train.py:581) and
`cudnn.benchmark`; the TPU-native equivalents are `jax.profiler` traces
(viewable in TensorBoard / Perfetto) and a throughput meter.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler device trace into `logdir` for TensorBoard."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Sliding-window rays/sec (or any unit/sec) counter with JSONL dumps."""

    def __init__(self, path: str = None, window: int = 50):
        self.path = path
        self.window = window
        self._events = []  # (t, n)

    def update(self, n: int) -> float:
        now = time.perf_counter()
        self._events.append((now, n))
        if len(self._events) > self.window:
            self._events = self._events[-self.window:]
        return self.rate()

    def rate(self) -> float:
        if len(self._events) < 2:
            return 0.0
        t0, _ = self._events[0]
        t1, _ = self._events[-1]
        total = sum(n for _, n in self._events[1:])
        return total / max(t1 - t0, 1e-9)

    def log(self, step: int, extra: dict = None):
        if not self.path:
            return
        rec = {"step": step, "rate": self.rate(), **(extra or {})}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
