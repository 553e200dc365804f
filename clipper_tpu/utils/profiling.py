"""Profiling / tracing helpers.

The reference's observability is a manual named Timer and per-stage wall
times in Solution structs (reference: include/clipper/utils.h:107-163,
sdp.h:28-36). TPU-native equivalent: the JAX profiler for device traces plus
the same lightweight named timers (clipper_tpu.utils.Timer).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a JAX/XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up in device traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Per-stage wall-time breakdown, reported as a dict.

    Mirrors the reference SDP Solution's timing breakdown style
    (reference: include/clipper/sdp.h:28-36).
    """

    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> dict:
        total = sum(self.stages.values())
        return dict(total=total, **self.stages)
