"""Tracing / profiling helpers (SURVEY.md §5).

The reference has a single wall-clock timer around the smoothing phase
(quantsmooth.h:72-86, 2820-2825).  Here: a phase timer with MP/s and
blocks/s reporting, plus an optional XLA profiler trace for the real
per-kernel timeline (view with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import sys
import time


class PhaseTimer:
    """Accumulates wall time per named phase; reports MP/s rates."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = (self.phases.get(name, 0.0)
                                 + time.perf_counter() - t0)

    def report(self, megapixels=None, blocks=None, file=sys.stderr):
        total = sum(self.phases.values())
        for name, dt in sorted(self.phases.items(), key=lambda kv: -kv[1]):
            line = f"  {name:<24s} {dt * 1e3:9.2f} ms"
            if megapixels:
                line += f"  {megapixels / dt:9.1f} MP/s"
            if blocks:
                line += f"  {blocks / dt:12.0f} blocks/s"
            print(line, file=file)
        print(f"  {'total':<24s} {total * 1e3:9.2f} ms", file=file)


@contextlib.contextmanager
def device_trace(log_dir):
    """XLA profiler trace around a region (open with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
