"""Tracing / profiling utilities (SURVEY.md §5 observability parity).

The reference only scrapes wall-clock from logs; here:

* `trace(path)` wraps a block in a `jax.profiler` trace (viewable in
  TensorBoard/Perfetto) for speed-of-light analysis of the device encoder;
* `StageTimer` collects named wall-clock stages and renders a report - used
  by the CLI experiments to report per-stage encode/decode timing the way the
  reference reports HM "Total Time".
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(path_to_trace_dir: str):
    """jax.profiler trace context (no-op fallback if the profiler fails)."""
    import jax

    try:
        jax.profiler.start_trace(path_to_trace_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                          total_s     calls   per_call_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            c = self.counts[name]
            lines.append(f"{name:<30} {t:9.3f} {c:9d} {1000 * t / c:12.3f}")
        return "\n".join(lines)
