"""Pseudo-relevance feedback (RM3-style) for the BM25 path, on device.

A capability the reference lacks entirely: expand the query with the
highest-mass terms of the first-pass top documents, then rescore —
the classic recall lever for sparse retrieval, here as a pure fixed-shape
device computation chained inside the fused query program:

  1. first-pass BM25 scores → top ``fb_docs`` rows;
  2. feedback term mass: ``m(t) = Σ_{d ∈ top} softmax(score_d) · contrib[d, t]``
     accumulated into a per-query [V+1] table (one scatter-add of
     ``fb_docs·D`` entries);
  3. top ``fb_terms`` terms by mass become expansion terms with weights
     ``(1-α) · mass / Σmass · Σ(original weights)``, concatenated onto the
     α-scaled original query.

The expanded query then goes through the same ``bm25_scores`` op.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from domain_rag_system_tpu.ops.dense_topk import lax_topk


@functools.partial(jax.jit, static_argnames=("fb_docs", "fb_terms", "vocab_size"))
def bm25_prf_expand(
    doc_terms: jax.Array,     # [N, D] int32, -1 padded
    doc_contrib: jax.Array,   # [N, D] f32
    first_scores: jax.Array,  # [B, N] first-pass BM25 scores
    query_ids: jax.Array,     # [B, L] int32, negative = padding
    query_weights: jax.Array, # [B, L] f32
    *,
    fb_docs: int = 10,
    fb_terms: int = 10,
    alpha: float = 0.6,
    vocab_size: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """→ (expanded ids [B, L+fb_terms], expanded weights [B, L+fb_terms])."""
    b, l = query_ids.shape
    v = int(vocab_size) if vocab_size else 1 << 20

    top_scores, top_idx = lax_topk(first_scores, fb_docs)      # [B, f]
    doc_w = jax.nn.softmax(top_scores, axis=-1)                # [B, f]

    fb_term_ids = jnp.take(doc_terms, top_idx, axis=0)         # [B, f, D]
    fb_contrib = jnp.take(doc_contrib, top_idx, axis=0)        # [B, f, D]
    mass_entries = fb_contrib * doc_w[..., None]               # [B, f, D]

    safe_ids = jnp.where(fb_term_ids >= 0,
                         jnp.minimum(fb_term_ids, v - 1), v)   # pad → sentinel
    flat_ids = safe_ids.reshape(b, -1)
    flat_mass = mass_entries.reshape(b, -1)
    rows = jnp.arange(b)[:, None]
    table = jnp.zeros((b, v + 1), jnp.float32).at[rows, flat_ids].add(flat_mass)
    table = table.at[:, v].set(0.0)                            # drop sentinel

    exp_mass, exp_ids = lax_topk(table[:, :v], fb_terms)       # [B, m]
    mass_sum = jnp.maximum(jnp.sum(exp_mass, axis=-1, keepdims=True), 1e-9)
    orig_sum = jnp.sum(jnp.where(query_ids >= 0, query_weights, 0.0),
                       axis=-1, keepdims=True)
    exp_w = (1.0 - alpha) * (exp_mass / mass_sum) * jnp.maximum(orig_sum, 1.0)
    exp_ids = jnp.where(exp_mass > 0, exp_ids, -2).astype(jnp.int32)

    new_ids = jnp.concatenate([query_ids, exp_ids], axis=-1)
    new_w = jnp.concatenate([alpha * query_weights, exp_w], axis=-1)
    return new_ids, new_w
