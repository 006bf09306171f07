"""Corpus-sharded retrieval with explicit XLA collectives.

The index-sharding design SURVEY.md §2.6 calls "the parallelism that does
matter here": the [N, d] embedding matrix and the [N, D] BM25 arrays are
row-sharded across the mesh's ``"shard"`` axis with ``NamedSharding``;
each device scores its rows and selects a LOCAL top-k; one ``all_gather``
of the (score, global-row) pairs rides ICI; every device then reduces the
S·k candidates to the global top-k. Communication is O(S·k) scores — never
the [B, N] score matrix — so scaling the corpus across chips costs a
constant-size collective per query batch.

Implemented with ``shard_map`` so the collective structure is explicit and
testable on a virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from domain_rag_system_tpu.ops.dense_topk import lax_topk
from domain_rag_system_tpu.ops.sparse_bm25 import bm25_scores
from domain_rag_system_tpu.parallel.mesh import SHARD_AXIS


def _merge_local_topk(local_scores, local_idx, rows_per_shard, k, axis):
    """Local [B, k] top-k → global [B, k] via one all_gather over ``axis``."""
    shard_id = jax.lax.axis_index(axis)
    global_idx = local_idx + shard_id * rows_per_shard
    # all_gather → [S, B, k]; tiled=False keeps the shard dimension leading.
    gathered_scores = jax.lax.all_gather(local_scores, axis)
    gathered_idx = jax.lax.all_gather(global_idx, axis)
    s = gathered_scores.shape[0]
    b = gathered_scores.shape[1]
    cand_scores = jnp.transpose(gathered_scores, (1, 0, 2)).reshape(b, s * k)
    cand_idx = jnp.transpose(gathered_idx, (1, 0, 2)).reshape(b, s * k)
    top_scores, top_pos = lax_topk(cand_scores, k)
    return top_scores, jnp.take_along_axis(cand_idx, top_pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_cosine_topk(
    queries: jax.Array,      # [B, d] replicated
    embeddings: jax.Array,   # [N, d] row-sharded over "shard"
    mask: jax.Array,         # [N] row-sharded; nonzero = keep
    k: int,
    mesh: Mesh,
) -> Tuple[jax.Array, jax.Array]:
    """Global (scores [B, k], row indices [B, k]) over a sharded corpus."""
    n = embeddings.shape[0]
    s = mesh.shape[SHARD_AXIS]
    rows_per_shard = n // s

    def local(q, e_shard, m_shard):
        scores = jax.lax.dot_general(
            q, e_shard, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(m_shard.reshape(1, -1) > 0, scores, -1e30)
        ls, li = lax_topk(scores, k)
        return _merge_local_topk(ls, li, rows_per_shard, k, SHARD_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(SHARD_AXIS, None), P(SHARD_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, embeddings, mask)


@functools.partial(jax.jit, static_argnames=("k", "mesh", "vocab_size"))
def sharded_bm25_topk(
    doc_terms: jax.Array,     # [N, D] row-sharded
    doc_contrib: jax.Array,   # [N, D] row-sharded
    query_ids: jax.Array,     # [B, L] replicated
    query_weights: jax.Array, # [B, L] replicated
    k: int,
    mesh: Mesh,
    vocab_size: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Global BM25 (scores [B, k], row indices [B, k]) over a sharded corpus."""
    n = doc_terms.shape[0]
    s = mesh.shape[SHARD_AXIS]
    rows_per_shard = n // s

    def local(t_shard, c_shard, q_ids, q_w):
        scores = bm25_scores(t_shard, c_shard, q_ids, q_w,
                             vocab_size=vocab_size)  # [B, N/s]
        ls, li = lax_topk(scores, k)
        return _merge_local_topk(ls, li, rows_per_shard, k, SHARD_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(doc_terms, doc_contrib, query_ids, query_weights)
