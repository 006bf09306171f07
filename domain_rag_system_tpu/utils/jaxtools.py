"""JAX runtime helpers shared by CLIs and the benchmark."""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persist XLA compilations across processes.

    CLI scripts re-jit the same programs every run; the on-disk cache turns
    the 20–40 s first-compile into a millisecond cache hit on subsequent
    invocations (both CPU and TPU backends).
    """
    import jax

    path = Path(cache_dir or os.environ.get(
        "DRS_TPU_COMPILE_CACHE", "~/.cache/drs_tpu_xla")).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def describe_devices() -> str:
    import jax

    devices = jax.devices()
    return f"{len(devices)}x {devices[0].device_kind} ({jax.default_backend()})"
