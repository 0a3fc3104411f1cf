"""Per-stage wall-clock profiling.

Counterpart of the reference's header-only Stopwatch singleton with
TICK/TOCK macros (src/Utils/Stopwatch.h:34-113).  The reference brackets
glFinish so timings are true GPU stage latency; here ``time`` blocks until
JAX async dispatch drains via block_until_ready when given arrays, or simply
times the context otherwise.  For deep kernel analysis use ``jax.profiler``
traces (utils/tracing.py).
"""

from __future__ import annotations

import contextlib
import time as _time
from collections import defaultdict

import jax


class Stopwatch:
    """Accumulates per-name (last_ms, total_ms, calls) like the reference's
    timing map; never prints unless asked (the reference's timings are
    debugger-inspectable only)."""

    def __init__(self) -> None:
        self.timings: dict[str, float] = {}
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, sync: object | None = None):
        t0 = _time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            ms = (_time.perf_counter() - t0) * 1000.0
            self.timings[name] = ms
            self.totals[name] += ms
            self.counts[name] += 1

    def tick(self, name: str) -> None:
        self.timings[f"__start_{name}"] = _time.perf_counter()

    def tock(self, name: str) -> None:
        start = self.timings.pop(f"__start_{name}", None)
        if start is None:
            return
        ms = (_time.perf_counter() - start) * 1000.0
        self.timings[name] = ms
        self.totals[name] += ms
        self.counts[name] += 1

    def mean_ms(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return self.totals.get(name, 0.0) / c if c else 0.0

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(
                f"{name:>24s}: last {self.timings.get(name, 0.0):8.2f} ms  "
                f"mean {self.mean_ms(name):8.2f} ms  n={self.counts[name]}"
            )
        return "\n".join(lines)
