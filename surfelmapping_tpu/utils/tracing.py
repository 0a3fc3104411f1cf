"""Profiler integration (aux-subsystem parity: the reference's Stopwatch is
its only tracing facility; on TPU we add real trace capture).

Usage:
    with trace_to("/tmp/trace"):            # open in TensorBoard/Perfetto
        mapper.process_frame(...)

    with annotate("fusion"):                # named region inside a trace
        ...
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace_to(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation (shows up in profiler timelines)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device HBM usage, for the GUI capacity-overlay analogue
    (build_map.cpp:204, GUI::drawCapacity)."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            stats[str(d)] = {}
    return stats
