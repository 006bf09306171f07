"""JAX runtime helpers shared by CLIs and the benchmark."""

from __future__ import annotations

import os
from pathlib import Path


def _host_cpu_fingerprint() -> str:
    """Short hash of this host's CPU feature set.

    XLA:CPU AOT cache entries bake in the machine features of the host
    that COMPILED them; ``cpu_aot_loader`` loads mismatched entries with
    only a warning ("could lead to execution errors such as SIGILL").
    When the persistent cache survives a host change (this container's
    cache dir does), CPU entries must be namespaced per host.
    """
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.split(":", 1)[1]
                    break
    except OSError:
        pass
    key = platform.machine() + " " + " ".join(sorted(flags.split()))
    return hashlib.sha1(key.encode()).hexdigest()[:10]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persist XLA compilations across processes.

    CLI scripts re-jit the same programs every run; the on-disk cache turns
    the 20–40 s first-compile into a millisecond cache hit on subsequent
    invocations (both CPU and TPU backends). CPU-platform processes
    (``JAX_PLATFORMS=cpu`` — the test suite and virtual-mesh drives) get a
    per-host subdirectory so AOT artifacts compiled on a previous host are
    never loaded; TPU entries are host-independent and stay at the root.
    """
    import jax

    path = Path(cache_dir or os.environ.get(
        "DRS_TPU_COMPILE_CACHE", "~/.cache/drs_tpu_xla")).expanduser()
    first_platform = os.environ.get(
        "JAX_PLATFORMS", "").split(",")[0].strip().lower()
    if first_platform == "cpu":
        path = path / f"cpu-{_host_cpu_fingerprint()}"
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def describe_devices() -> str:
    import jax

    devices = jax.devices()
    return f"{len(devices)}x {devices[0].device_kind} ({jax.default_backend()})"
