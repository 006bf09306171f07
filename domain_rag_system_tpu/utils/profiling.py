"""Profiling helpers (SURVEY.md §5.1 — the reference records only bare
``time.time()`` deltas; here the jitted query program can be traced with
the JAX profiler and every pipeline stage is timed via StageTimer)."""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Iterator

from domain_rag_system_tpu.utils.logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/drs_tpu_trace",
          host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a JAX/XLA profiler trace around a block.

    View with TensorBoard's profile plugin or xprof. No-ops gracefully if
    the profiler cannot start (e.g. nested traces).
    """
    import jax

    path = Path(log_dir)
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.profiler.start_trace(str(path), create_perfetto_trace=True)
        started = True
        log.info("profiler trace started → %s", path)
    except Exception as exc:
        log.warning("profiler trace unavailable: %s", exc)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                log.info("profiler trace written → %s", path)
            except Exception as exc:
                log.warning("profiler stop failed: %s", exc)


def annotate(name: str):
    """Named profiler span (``jax.profiler.TraceAnnotation``) usable as a
    context manager inside the serving loop."""
    import jax

    return jax.profiler.TraceAnnotation(name)
