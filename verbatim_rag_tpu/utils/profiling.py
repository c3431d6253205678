"""Tracing + per-stage timing utilities.

SURVEY.md §5 "Tracing/profiling": the reference only timestamps extraction
in the streaming path; the TPU build adds (a) a stage timer emitting the
same ``{"stage": ..., "elapsed_ms": ...}`` event shape, and (b) a
`jax.profiler` trace context for device-level investigation.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)


@dataclass
class StageTimer:
    """Accumulates named stage timings; renders streaming-style events."""

    stages: list[dict] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed_ms = int((time.perf_counter() - start) * 1000)
            self.stages.append({"stage": name, "elapsed_ms": elapsed_ms})
            logger.debug("stage %s: %d ms", name, elapsed_ms)

    def events(self) -> list[dict]:
        return [{"type": "progress", **s} for s in self.stages]

    def total_ms(self) -> int:
        return sum(s["elapsed_ms"] for s in self.stages)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """`jax.profiler` trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def trace_module_wall_ms(logdir: str) -> float:
    """Total device-side XLA-module wall time (ms) recorded in a
    `jax.profiler` trace under ``logdir``.

    Module wall (the "XLA Modules" timeline) includes inter-op gaps — DMA
    waits, scheduling bubbles — that per-op durations miss, and excludes
    host dispatch latency entirely. On tunneled backends this is the only
    honest per-call device time: pipelined host timing keeps ~7-9 ms of
    per-dispatch RPC cost that no pipeline depth removes (measured round 5,
    benchmarks/profile_section_trace.py). Divide by the number of calls
    issued inside the trace for a per-call figure.

    Requires the tensorflow tsl xplane proto (present in this image);
    raises ImportError/RuntimeError otherwise — callers treat the trace
    companion as best-effort.
    """
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    total_ms = 0.0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                total_ms += sum(ev.duration_ps / 1e9 for ev in line.events)
    return total_ms


def block_and_time(fn, *args, readback: bool = True, **kwargs) -> tuple[float, object]:
    """Time a device call honestly: force a host readback of one leaf.

    On tunneled backends `block_until_ready` can return before execution
    completes; copying a result to host is the reliable barrier.
    """
    import jax
    import numpy as np

    start = time.perf_counter()
    out = fn(*args, **kwargs)
    leaf = jax.tree.leaves(out)[0]
    if readback:
        np.asarray(leaf)
    else:
        leaf.block_until_ready()
    return time.perf_counter() - start, out
