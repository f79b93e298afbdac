"""Profiling / tracing helpers.

The reference has near-zero observability (SURVEY.md §5: CUDA-event prints
in ``inference.py:69-80`` and tqdm bars). Here: ``jax.profiler`` traces for
the TensorBoard profiler plus lightweight wall-clock scopes that feed the
KV logger.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

from audiopure_tpu.utils import logging as logger


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, sync: Optional[object] = None) -> Iterator[None]:
    """Wall-clock a scope into the KV logger; pass a jax array as ``sync``
    to block on device completion (the CUDA-event-timing equivalent)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        logger.logkv_mean(f"time/{name}", time.perf_counter() - t0)


def annotate(name: str):
    """Named XLA trace annotation (shows up in profiler timelines)."""
    return jax.profiler.TraceAnnotation(name)


def memory_stats() -> dict:
    """Per-device memory statistics where the backend reports them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
