"""Profiling: per-phase wall-clock timers and XLA trace capture.

The reference's only timing is ``time.time()`` deltas around test passes
(``/root/reference/cross_val_eval.py:105-109,134-138``).  Here a first-class
perf module (SURVEY.md §5): named phase timers with throughput reporting,
and a ``jax.profiler`` trace context for TensorBoard/Perfetto capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class PhaseTimer:
    """Accumulates wall-clock per named phase.

    Usage::

        timer = PhaseTimer()
        with timer.phase("embed"):
            ...
        print(timer.report())
    """

    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def seconds(self, name: str) -> float:
        return self.totals[name]

    def mean_seconds(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(
                f"{name}: total {self.totals[name]:.3f}s over "
                f"{self.counts[name]} calls "
                f"({self.mean_seconds(name) * 1e3:.2f} ms/call)"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            name: {
                "total_s": self.totals[name],
                "calls": self.counts[name],
                "mean_ms": self.mean_seconds(name) * 1e3,
            }
            for name in self.totals
        }


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context: labels a host region in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
