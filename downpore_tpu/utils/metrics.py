"""Per-stage wall-clock / throughput counters and JAX profiler hooks.

The reference's observability is stderr stats plus a hardwired pprof dump
(ref: commands/correct.go:63-64, commands/overlap.go:117-122); here every
pipeline can record named stages with item counts and emit a reads/s
summary, and any command can capture a JAX profiler trace for TensorBoard
with ``-profile <dir>``.
"""
from __future__ import annotations

import sys
import time
from contextlib import contextmanager
from typing import Dict, Optional


class StageTimer:
    """Accumulates (wall seconds, item count) per named stage."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: Dict[str, list] = {}

    @contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.time()
        try:
            yield self
        finally:
            dt = time.time() - t0
            acc = self.stages.setdefault(name, [0.0, 0])
            acc[0] += dt
            acc[1] += items

    def add_items(self, name: str, items: int):
        acc = self.stages.setdefault(name, [0.0, 0])
        acc[1] += items

    def report(self, out=None):
        if out is None:
            out = sys.stderr  # resolved at call time (testable)
        if not self.enabled or not self.stages:
            return
        for name, (secs, items) in self.stages.items():
            rate = f"  ({items / secs:.1f}/s)" if items and secs > 0 else ""
            count = f"  {items} items" if items else ""
            print(f"[stage] {name}: {secs:.2f}s{count}{rate}", file=out)


_trace_dir: Optional[str] = None


def start_profiler(trace_dir: str):
    """Begin a JAX profiler capture (TensorBoard trace format)."""
    global _trace_dir
    import jax
    jax.profiler.start_trace(trace_dir)
    _trace_dir = trace_dir


def stop_profiler():
    global _trace_dir
    if _trace_dir is not None:
        import jax
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {_trace_dir}", file=sys.stderr)
        _trace_dir = None
