"""Profiling/tracing utilities (the reference has none — SURVEY.md §5).

Wraps ``jax.profiler`` so any region of the framework can be captured to a
TensorBoard-compatible trace, plus a lightweight wall-clock timer registry
for coarse per-stage timing without a trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Cumulative wall-clock timers: ``with timer.section("mel"): ...``;
    ``timer.report()`` prints totals. Used by bench/experiments."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            count = self.counts[name]
            lines.append(
                f"{name:30s} {total:9.3f} s total, {count:6d} calls, "
                f"{total / count * 1e3:9.3f} ms avg"
            )
        return "\n".join(lines)
