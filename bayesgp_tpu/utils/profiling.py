"""Tracing / timing utilities.

The reference has no tracing story (SURVEY.md section 5: TMB runs with
silent=TRUE). Here: a phase timer that every fit can opt into, and a
jax.profiler bridge for device traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import OrderedDict


class PhaseTimer:
    """Accumulates wall-clock per named phase; printable summary."""

    def __init__(self):
        self.times = OrderedDict()

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0)

    def summary(self) -> str:
        total = sum(self.times.values())
        lines = [f"{name:<28} {t:>9.3f}s {100 * t / max(total, 1e-12):5.1f}%"
                 for name, t in self.times.items()]
        lines.append(f"{'total':<28} {total:>9.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
