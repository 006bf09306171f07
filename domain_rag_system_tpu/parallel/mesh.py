"""Device-mesh helpers.

The reference has no distribution at all (single Python process scanning a
local Qdrant dir — SURVEY.md §2.6). The TPU-native scaling unit here is a
1-D ``jax.sharding.Mesh`` over the ``"shard"`` axis: the corpus (dense
embedding matrix and BM25 doc-term arrays) is row-sharded across devices,
queries are replicated, and per-shard top-k candidates are merged with one
``all_gather`` over ICI (see ``sharded_search.py``). A second ``"data"``
axis is used by the trainer for batch parallelism and ``"model"`` for
tensor parallelism (see ``training/``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

SHARD_AXIS = "shard"


def get_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (SHARD_AXIS,),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default: a 1-D mesh over all devices. Pass ``shape`` for multi-axis
    meshes, e.g. ``get_mesh(8, ("data", "model"), (4, 2))``.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    selected = np.array(devices[:n_devices])
    if shape is None:
        shape = (n_devices,)
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    return Mesh(selected.reshape(shape), axis_names)


def shard_rows(array, mesh: Mesh, axis: str = SHARD_AXIS):
    """Place ``array`` row-sharded over ``mesh`` (first dim split on ``axis``).

    The row count must divide evenly — index layers pad the corpus to a
    multiple of ``row_block``; choose ``row_block`` divisible by the mesh
    size.
    """
    spec = P(axis, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def replicate(array, mesh: Mesh):
    return jax.device_put(array, NamedSharding(mesh, P()))
