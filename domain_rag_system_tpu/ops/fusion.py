"""On-device rank fusion.

The reference fuses dense and sparse result lists in Python dicts
(``src/indexing/hybrid_indexer.py:112-218``). Here fusion is a dense
fixed-shape computation so it can sit inside the jitted query program between
retrieval and rerank-candidate selection:

  * RRF   — ``score(c) = Σ_lists 1 / (k + rank_list(c))`` with k = 60
            (reference ``:113``);
  * weighted — min-max normalization per list then a weighted sum
            (reference ``:158-218``, including its fallback to *raw* scores
            when a list's max equals its min).

Candidate sets are the concatenation of both id lists; duplicate candidates
keep their first occurrence (dense list first, like the reference's
insertion-ordered dict) and padding slots (id < 0) are excluded. Everything
is [C]×[K] broadcast compares — C, K ≤ a few hundred, negligible work, no
host round-trip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from domain_rag_system_tpu.ops.dense_topk import lax_topk

# Python literal, NOT a jnp scalar: a module-level device array gets
# baked into every closing jit as a jaxpr CONSTANT, and MLIR lowering
# fetches constants' host values (array._value) — a device_get at
# LOWERING time, which can hang indefinitely when the remote-TPU
# transport is in its wedge mode (observed round 5: every fresh-shape
# lowering stalled in ir_constant). A literal lowers inline.
NEG_INF = -1e30
RRF_K = 60


def _first_occurrence_mask(cand: jax.Array) -> jax.Array:
    """True for the first slot holding each distinct id (valid ids only)."""
    c = cand.shape[0]
    eq = cand[:, None] == cand[None, :]                      # [C, C]
    earlier = jnp.tril(jnp.ones((c, c), dtype=bool), k=-1)   # strictly lower
    dup_of_earlier = jnp.any(eq & earlier, axis=1)
    return (cand >= 0) & ~dup_of_earlier


def _membership(cand: jax.Array, ids: jax.Array) -> jax.Array:
    """[C, K] bool: cand[i] == ids[j] (padding ids < 0 never match)."""
    return (cand[:, None] == ids[None, :]) & (ids[None, :] >= 0)


@functools.partial(jax.jit, static_argnames=("top_k", "k"))
def rrf_fuse_device(
    ids_a: jax.Array,  # [Ka] int32, rank order, -1 padded
    ids_b: jax.Array,  # [Kb] int32, rank order, -1 padded
    top_k: int,
    k: int = RRF_K,
) -> Tuple[jax.Array, jax.Array]:
    """Reciprocal-rank fusion → (fused ids [top_k], fused scores [top_k])."""
    cand = jnp.concatenate([ids_a, ids_b])                   # [C]
    top_k = min(top_k, cand.shape[0])

    def rrf_from(ids):
        ranks = jnp.arange(1, ids.shape[0] + 1, dtype=jnp.float32)
        contrib = 1.0 / (k + ranks)                          # [K]
        return jnp.sum(_membership(cand, ids) * contrib[None, :], axis=1)

    score = rrf_from(ids_a) + rrf_from(ids_b)
    score = jnp.where(_first_occurrence_mask(cand), score, NEG_INF)
    top_scores, top_idx = lax_topk(score, top_k)
    fused_ids = jnp.where(top_scores > NEG_INF / 2, cand[top_idx], -1)
    return fused_ids, top_scores


def _minmax_normalize(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """Min-max over valid slots; if max == min, return raw scores
    (reference fallback semantics, hybrid_indexer.py:176-185)."""
    big = jnp.where(valid, scores, jnp.inf)
    small = jnp.where(valid, scores, -jnp.inf)
    lo = jnp.min(big)
    hi = jnp.max(small)
    span = hi - lo
    return jnp.where(span > 0, (scores - lo) / jnp.where(span > 0, span, 1.0), scores)


@functools.partial(jax.jit, static_argnames=("top_k", "k"))
def rrf_fuse_batch(
    ids_a: jax.Array,  # [B, Ka] rank order, -1 padded
    ids_b: jax.Array,  # [B, Kb]
    top_k: int,
    k: int = RRF_K,
) -> Tuple[jax.Array, jax.Array]:
    """Batched RRF: one device program for the whole query batch."""
    fuse = lambda a, b: rrf_fuse_device(a, b, top_k, k)
    return jax.vmap(fuse)(ids_a, ids_b)


@functools.partial(jax.jit, static_argnames=("top_k",))
def weighted_fuse_batch(
    ids_a: jax.Array, scores_a: jax.Array,   # [B, Ka]
    ids_b: jax.Array, scores_b: jax.Array,   # [B, Kb]
    top_k: int,
    weight_a: float = 0.5,
    weight_b: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Batched min-max weighted fusion."""
    fuse = lambda ia, sa, ib, sb: weighted_fuse_device(
        ia, sa, ib, sb, top_k, weight_a, weight_b)
    return jax.vmap(fuse)(ids_a, scores_a, ids_b, scores_b)


@functools.partial(jax.jit, static_argnames=("top_k",))
def weighted_fuse_device(
    ids_a: jax.Array, scores_a: jax.Array,   # [Ka]
    ids_b: jax.Array, scores_b: jax.Array,   # [Kb]
    top_k: int,
    weight_a: float = 0.5,
    weight_b: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Min-max weighted-sum fusion → (fused ids, fused scores)."""
    cand = jnp.concatenate([ids_a, ids_b])
    top_k = min(top_k, cand.shape[0])

    norm_a = _minmax_normalize(scores_a, ids_a >= 0)
    norm_b = _minmax_normalize(scores_b, ids_b >= 0)

    contrib_a = jnp.sum(_membership(cand, ids_a) * norm_a[None, :], axis=1)
    contrib_b = jnp.sum(_membership(cand, ids_b) * norm_b[None, :], axis=1)
    score = weight_a * contrib_a + weight_b * contrib_b

    score = jnp.where(_first_occurrence_mask(cand), score, NEG_INF)
    top_scores, top_idx = lax_topk(score, top_k)
    fused_ids = jnp.where(top_scores > NEG_INF / 2, cand[top_idx], -1)
    return fused_ids, top_scores
