"""Profiling hooks — the rebuild's upgrade over the reference's hand-rolled
wall-clock telemetry (PredictionGen.cpp:850-863, BayesianNN.cpp:409-561,
EvaluateNN.cpp:65-82; SURVEY.md section 5.1).

Console progress/ETA lives in the pipeline and trainer; this module adds the
TPU-native layer: ``jax.profiler`` traces viewable in TensorBoard/Perfetto
(device timelines, HLO cost breakdowns) and named trace annotations so
pipeline phases show up as spans.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Iterator, Optional

log = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``trace_dir`` for the duration of
    the block.  No-op when ``trace_dir`` is falsy, so callers can thread an
    optional --trace-dir flag straight through."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    log.info("jax.profiler trace -> %s", trace_dir)
    with jax.profiler.trace(trace_dir):
        yield
    log.info("trace complete: view with TensorBoard (profile plugin) or "
             "Perfetto")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span visible in profiler timelines (TraceAnnotation), plus a
    debug-level wall-clock line — the reference's console telemetry, kept."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    log.debug("%s: %.3fs", name, time.perf_counter() - t0)
