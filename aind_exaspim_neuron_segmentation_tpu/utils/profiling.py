"""Tracing and per-stage timing.

The reference's only instrumentation is tqdm progress bars (SURVEY.md
section 5); this subsystem adds first-class observability:

* :class:`StageTimer` -- named wall-clock stages with device
  synchronization, printable/loggable summary;
* :func:`trace` -- context manager around ``jax.profiler`` producing a
  TensorBoard-viewable device trace;
* :func:`annotate` -- named trace regions (shows up in the profiler
  timeline).
"""

import contextlib
import time
from collections import OrderedDict

import jax


class StageTimer:
    """Accumulates wall-clock time per named stage.

    ``sync=True`` (default) blocks on outstanding device work at stage
    boundaries so device time is attributed to the right stage -- on this
    platform independent dispatches execute concurrently, so unsynced
    timings lie (measured in-session 2026-08-16).
    """

    def __init__(self, sync=True):
        self.sync = sync
        self.totals = OrderedDict()
        self.counts = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name):
        """Context manager timing one named stage (device-synced)."""
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self):
        """Human-readable per-stage totals/averages/percentages."""
        lines = []
        total = sum(self.totals.values())
        for name, t in self.totals.items():
            n = self.counts[name]
            lines.append(
                f"{name:>24}: {t:8.3f}s  ({n}x, {t / n * 1e3:8.1f} ms avg,"
                f" {100 * t / total if total else 0:5.1f}%)"
            )
        return "\n".join(lines)

    def as_dict(self):
        """Stage-name -> total-seconds mapping."""
        return dict(self.totals)


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler device trace viewable in TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region in the profiler timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
