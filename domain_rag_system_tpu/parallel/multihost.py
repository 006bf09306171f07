"""Multi-host (multi-process) corpus sharding over DCN.

Single-slice scaling shards the corpus over the mesh's ``"shard"`` axis
(`mesh.py`, `sharded_search.py`). When the corpus outgrows one host's HBM —
SURVEY.md §2.6's "DCN + jax.distributed only if corpus exceeds one slice" —
each process loads ONLY its slice of the corpus from disk and contributes
its local rows to one global sharded array; the same `shard_map` retrieval
programs then run unchanged on the global mesh, with the top-k merge
all_gather riding ICI within a slice and DCN across slices.

Key pieces:

- :func:`init_multihost` — `jax.distributed.initialize` wrapper; on TPU
  pods every argument is auto-detected from the environment, elsewhere
  (tests, CPU clusters) pass coordinator/process counts explicitly.
- :func:`process_slice` — which corpus rows THIS process owns (contiguous
  block partitioning, padded to equal per-process row counts so the global
  array shards evenly).
- :func:`global_sharded_rows` — assemble the global row-sharded array from
  process-local rows via `jax.make_array_from_process_local_data`; no
  host ever materializes the full corpus.

Verified by a real 2-process CPU test (Gloo collectives) asserting the
distributed top-k equals the single-process oracle
(`tests/test_multihost.py`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from domain_rag_system_tpu.parallel.mesh import SHARD_AXIS
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the distributed runtime; returns (process_id, num_processes).

    On TPU pod slices all three arguments are discovered from the
    environment (leave them None). A second call is a no-op (JAX keeps the
    existing runtime), so library code may call this unconditionally.
    """
    # IMPORTANT: decide WITHOUT touching jax — any jax call (process_count,
    # default_backend, devices) initializes the XLA backend, after which
    # jax.distributed.initialize() can only fail. Pod detection therefore
    # sniffs the environment variables the TPU runtime sets on multi-host
    # slices.
    import os

    explicit = coordinator_address is not None
    pod_env = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = not explicit and len(pod_env.split(",")) > 1
    if explicit or on_tpu_pod:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as exc:
            # already initialized (idempotent call) — leave the runtime
            log.info("jax.distributed.initialize skipped: %s", exc)
    pid, n = jax.process_index(), jax.process_count()
    log.info("multihost: process %d/%d, %d local / %d global devices",
             pid, n, jax.local_device_count(), jax.device_count())
    return pid, n


def padded_rows_total(n_rows: int, num_processes: int,
                      block: int = 8) -> int:
    """Global row count after padding: divisible by processes × block so
    every process holds the same number of rows and the per-process slab
    still splits evenly over its local devices."""
    unit = num_processes * block
    return ((n_rows + unit - 1) // unit) * unit


def process_slice(n_rows: int, num_processes: Optional[int] = None,
                  process_id: Optional[int] = None,
                  block: int = 8) -> Tuple[int, int, int]:
    """Contiguous (start, stop, padded_total) of rows THIS process owns.

    ``stop`` may exceed ``n_rows`` for the last process — those rows are
    padding the caller fills with zeros (and masks invalid, exactly like
    the single-host index's padded tail).
    """
    num_processes = num_processes or jax.process_count()
    process_id = jax.process_index() if process_id is None else process_id
    total = padded_rows_total(n_rows, num_processes, block)
    per = total // num_processes
    return process_id * per, (process_id + 1) * per, total


def global_sharded_rows(local_rows: np.ndarray, mesh: Mesh,
                        axis: str = SHARD_AXIS) -> jax.Array:
    """Assemble one global row-sharded array from per-process local rows.

    ``local_rows`` is this process's slab (`process_slice` rows, padded);
    the result behaves like an array of shape [num_processes * per, ...]
    sharded over ``axis`` — without any host holding more than its slab.
    """
    spec = P(axis, *([None] * (local_rows.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_rows)


def global_replicated(value: np.ndarray, mesh: Mesh) -> jax.Array:
    """Replicate a host value (e.g. the query batch) across the global mesh.

    Every process must pass the same ``value`` (queries are broadcast to
    all hosts by the serving frontend)."""
    sharding = NamedSharding(mesh, P(*([None] * value.ndim)))
    return jax.make_array_from_process_local_data(sharding, value)
