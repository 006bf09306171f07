"""Sharded search over the 8-device virtual CPU mesh must equal unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domain_rag_system_tpu.ops.dense_topk import cosine_topk
from domain_rag_system_tpu.ops.sparse_bm25 import bm25_scores
from domain_rag_system_tpu.parallel import (
    get_mesh,
    shard_rows,
    sharded_bm25_topk,
    sharded_cosine_topk,
)
from domain_rag_system_tpu.parallel.mesh import replicate


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = get_mesh()
    assert mesh.shape == {"shard": 8}


def test_mesh_shapes_and_errors():
    mesh = get_mesh(4)
    assert mesh.shape == {"shard": 4}
    mesh2 = get_mesh(8, ("data", "model"), (4, 2))
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        get_mesh(9)
    with pytest.raises(ValueError):
        get_mesh(8, ("a", "b"), (3, 2))


def test_sharded_cosine_topk_matches_unsharded(rng):
    mesh = get_mesh()
    n, d, b, k = 512, 64, 4, 10
    emb = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    mask = (rng.random(n) > 0.2).astype(np.int32)

    ref_scores, ref_idx = cosine_topk(jnp.asarray(q), jnp.asarray(emb), k,
                                      mask=jnp.asarray(mask))

    emb_sh = shard_rows(jnp.asarray(emb), mesh)
    mask_sh = shard_rows(jnp.asarray(mask), mesh)
    q_rep = replicate(jnp.asarray(q), mesh)
    scores, idx = sharded_cosine_topk(q_rep, emb_sh, mask_sh, k, mesh)

    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_sharded_bm25_topk_matches_unsharded(rng):
    mesh = get_mesh()
    n, dterms, b, l, k = 256, 16, 3, 8, 7
    vocab = 50
    doc_terms = rng.integers(-1, vocab, size=(n, dterms)).astype(np.int32)
    doc_contrib = (rng.random((n, dterms)) * (doc_terms >= 0)).astype(np.float32)
    q_ids = rng.integers(0, vocab, size=(b, l)).astype(np.int32)
    q_w = np.ones((b, l), dtype=np.float32)

    full = bm25_scores(jnp.asarray(doc_terms), jnp.asarray(doc_contrib),
                       jnp.asarray(q_ids), jnp.asarray(q_w))
    from domain_rag_system_tpu.ops.dense_topk import lax_topk
    ref_scores, ref_idx = lax_topk(full, k)

    scores, idx = sharded_bm25_topk(
        shard_rows(jnp.asarray(doc_terms), mesh),
        shard_rows(jnp.asarray(doc_contrib), mesh),
        jnp.asarray(q_ids), jnp.asarray(q_w), k, mesh,
    )
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_mesh_sharded_indexes_end_to_end(toy_chunks):
    """The SAME fused pipeline program must run and give identical results
    when the index arrays are row-sharded across the 8-device mesh."""
    from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
    from domain_rag_system_tpu.models import MedicalEmbedder
    from domain_rag_system_tpu.pipeline import RetrievalPipeline

    emb = MedicalEmbedder(dim=256)
    plain = HybridIndex(dense_index=DenseIndex(emb, row_block=8),
                        bm25_index=BM25Index())
    plain.index_chunks(toy_chunks)
    p_plain = RetrievalPipeline(plain)

    mesh = get_mesh()
    emb2 = MedicalEmbedder(dim=256)
    sharded = HybridIndex(dense_index=DenseIndex(emb2, row_block=8, mesh=mesh),
                          bm25_index=BM25Index(mesh=mesh))
    sharded.index_chunks(toy_chunks)
    assert len(sharded.dense_index.embeddings.sharding.device_set) == 8
    p_shard = RetrievalPipeline(sharded)

    queries = ["diabetes treatment", "pain relief", "blood pressure drug"]
    out_plain = p_plain.query_batch(queries, top_k=5)
    out_shard = p_shard.query_batch(queries, top_k=5)
    for a, b in zip(out_plain, out_shard):
        assert [r["chunk_id"] for r in a["results"]] == \
               [r["chunk_id"] for r in b["results"]]
