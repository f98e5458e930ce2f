"""Profiling: per-phase wall-clock timers and XLA trace capture.

The reference's only timing is ``time.time()`` deltas around test passes
(``/root/reference/cross_val_eval.py:105-109,134-138``).  Here a first-class
perf module (SURVEY.md §5): named phase timers with throughput reporting,
and a ``jax.profiler`` trace context for TensorBoard/Perfetto capture.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from dataclasses import dataclass, field


def slope_of_chain(build_chain, ks=(2, 5, 10), reps: int = 4) -> float:
    """Median pairwise slope for computations that build their own scan —
    e.g. a TrainState carried across iterations, where :func:`slope_time`'s
    generic perturb-first-arg chain does not apply.  ``build_chain(k)``
    returns a zero-arg callable whose result forces completion (a ``float()``
    scalar readback).  One definition so the bench's recorded
    ``train_step_ms`` and the audit harness (tools/profile_train.py) can
    never diverge in methodology."""
    totals = {}
    for k in ks:
        g = build_chain(k)
        g()  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        totals[k] = best
    slopes = sorted(
        (totals[b] - totals[a]) / (b - a)
        for a, b in ((ks[0], ks[1]), (ks[1], ks[2]), (ks[0], ks[2]))
    )
    return slopes[1]


def train_step_chain(step, state, patches, mask, label, tile_indices, key):
    """``build_chain`` (for :func:`slope_of_chain`) running ``step`` — a
    ``make_train_step`` callable — k times inside one jitted ``lax.scan``.
    The bag's patches are perturbed by the carried optimizer step count
    (``+ st.step * 0`` defeats CSE without changing values), so the scanned
    steps cannot collapse."""
    import jax
    import jax.numpy as jnp

    from montecarlo_gated_mil_tpu.core.bag import Bag

    def build(k):
        @jax.jit
        def f(st, p):
            def body(carry, i):
                st = carry
                b = Bag(
                    patches=p + st.step.astype(p.dtype) * 0,
                    mask=mask, label=label, tile_indices=tile_indices,
                )
                st, m = step(st, b, jax.random.fold_in(key, i), jnp.asarray(True))
                return st, m["loss"]

            st, losses = jax.lax.scan(body, st, jnp.arange(k))
            return jnp.sum(losses)

        return lambda: float(f(state, patches))

    return build


def slope_time(fn, *args, ks=(2, 6, 12), reps: int = 4) -> float:
    """Pure device time per call of ``fn(*args)`` via the chained-iteration
    slope (the project's canonical measurement method, docs/PERFORMANCE.md
    §methodology): run the computation k times inside one jitted
    ``lax.scan`` for several k, force completion with a scalar readback,
    and take the median pairwise slope of the totals.  This cancels
    dispatch and transfer latency exactly — required on runtimes where
    ``block_until_ready`` does not wait for device compute and scalar
    readbacks carry a tunnel round-trip.

    The first positional argument is perturbed per iteration (floats get
    ``+carry*1e-6``, integer arrays get a bit toggle) so the scanned calls
    cannot be collapsed.  Measure on a quiet host (methodology item 3).
    """
    import jax
    import jax.numpy as jnp

    def chain(k, *a):
        def body(c, i):
            if jnp.issubdtype(a[0].dtype, jnp.floating):
                first = a[0] + (c * 1e-6).astype(a[0].dtype)
            else:
                first = a[0] ^ (i % 2).astype(a[0].dtype)
            out = fn(first, *a[1:])
            leaf = out[0] if isinstance(out, tuple) else out
            return jnp.sum(leaf.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), jnp.arange(k))
        return c

    totals = {}
    for k in ks:
        g = jax.jit(functools.partial(chain, k))
        float(g(*args))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(*args))  # readback forces completion
            best = min(best, time.perf_counter() - t0)
        totals[k] = best
    slopes = sorted(
        (totals[b] - totals[a]) / (b - a)
        for a, b in ((ks[0], ks[1]), (ks[1], ks[2]), (ks[0], ks[2]))
    )
    return slopes[1]


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
