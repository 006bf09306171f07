"""Tensor-parallel partition rules for the BERT parameter tree.

Megatron-style sharding over the mesh's ``"model"`` axis:

  * attention q/k/v DenseGeneral kernels [H, heads, head_dim] — shard the
    ``heads`` dimension (each device owns a head subset; the attention
    einsums stay local, the output projection reduces across the axis);
  * attention output kernel [heads, head_dim, H] — shard ``heads`` (row
    parallel → XLA inserts the psum);
  * MLP up-projection kernel [H, 4H] — shard columns; down-projection
    [4H, H] — shard rows (the classic column→row pair, one collective per
    layer);
  * embeddings, layer norms, biases of row-sharded layers — replicated.

These are advisory shardings handed to ``jit``'s ``in_shardings``; XLA
inserts the collectives (SPMD partitioner), which is the TPU-native
equivalent of hand-written all-reduce hooks.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import PartitionSpec as P


def param_partition_spec(path: Tuple, value, model_axis: str = "model"):
    """Map a flattened param path → PartitionSpec."""
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)

    if value.ndim == 3 and ("query" in joined or "key" in joined or "value" in joined):
        return P(None, model_axis, None)        # [H, heads, head_dim]
    if value.ndim == 2 and ("query" in joined or "key" in joined or "value" in joined):
        return P(model_axis, None)              # qkv bias [heads, head_dim]
    if value.ndim == 3 and "attention/output" in joined:
        return P(model_axis, None, None)        # [heads, head_dim, H]
    if value.ndim == 2 and "intermediate" in joined:
        return P(None, model_axis)              # [H, 4H] column-parallel
    if value.ndim == 1 and "intermediate" in joined:
        return P(model_axis)                    # bias [4H]
    if value.ndim == 2 and "mlp_output" in joined:
        return P(model_axis, None)              # [4H, H] row-parallel
    return P()                                  # replicated


def partition_params(params, mesh, model_axis: str = "model"):
    """PartitionSpec pytree for a parameter pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: param_partition_spec(path, v, model_axis), params
    )
