"""Dense index: embedder determinism, top-k correctness vs numpy brute force,
masking, Pallas/XLA agreement."""

import numpy as np
import pytest

from domain_rag_system_tpu.indexing import DenseIndex
from domain_rag_system_tpu.models import LexicalHashEmbedder, MedicalEmbedder


def test_hash_embedder_deterministic_and_normalized():
    emb = LexicalHashEmbedder(dim=256)
    a = emb.encode("aspirin treats pain")
    b = emb.encode("aspirin treats pain")
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 256)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)


def test_hash_embedder_similarity_sanity():
    emb = LexicalHashEmbedder(dim=512)
    vecs = emb.encode([
        "aspirin treats pain and fever",
        "aspirin is used for pain relief",
        "photosynthesis in green plants",
    ])
    sim = vecs @ vecs.T
    assert sim[0, 1] > sim[0, 2]
    assert sim[0, 1] > 0.2


def test_hash_embedder_state_round_trip(toy_chunks):
    emb = LexicalHashEmbedder(dim=128).fit([c.text for c in toy_chunks])
    emb2 = LexicalHashEmbedder.from_state_arrays(emb.state_arrays())
    np.testing.assert_array_equal(emb.encode("diabetes"), emb2.encode("diabetes"))


def test_medical_embedder_facade_degrades_to_hash():
    emb = MedicalEmbedder(model_name="pritamdeka/S-PubMedBert-MS-MARCO")
    # no checkpoint available in this environment -> hash fallback
    assert emb.backend_name == "LexicalHashEmbedder"
    info = emb.get_model_info()
    assert info["requested_model"] == "pritamdeka/S-PubMedBert-MS-MARCO"


@pytest.fixture
def dense(toy_chunks):
    index = DenseIndex(MedicalEmbedder(dim=512), row_block=8)
    index.index_chunks(toy_chunks)
    return index


def test_dense_topk_matches_numpy(dense, toy_chunks):
    emb = dense.embedder
    corpus = emb.encode([c.text for c in toy_chunks])
    for query in ["diabetes insulin treatment", "pain relief"]:
        q = emb.encode(query)[0]
        expected_order = np.argsort(-(corpus @ q), kind="stable")[:5]
        scores, idx = dense.search_batch([query], top_k=5)
        np.testing.assert_array_equal(idx[0], expected_order)


def test_dense_search_schema_and_threshold(dense):
    results = dense.search("diabetes treatment", top_k=5, score_threshold=0.05)
    assert results
    assert all(r["score"] >= 0.05 for r in results)
    assert set(results[0]) == {"chunk_id", "doc_id", "source", "chunk_type",
                               "text", "metadata", "score"}


def test_dense_filters(dense):
    results = dense.search("pain", top_k=6, filters={"source_tag": "odd"})
    assert results
    assert all(r["metadata"]["source_tag"] == "odd" for r in results)


def test_dense_padding_never_returned(dense, toy_chunks):
    # row_block=8 with 12 chunks -> 16 padded rows; ask for all 12
    scores, idx = dense.search_batch(["drug"], top_k=12)
    assert idx.max() < len(toy_chunks)


def test_pallas_masked_scores_matches_xla():
    import jax
    import jax.numpy as jnp

    from domain_rag_system_tpu.ops.dense_topk import (
        dense_scores, pallas_masked_scores)

    rng = np.random.default_rng(0)
    q = rng.normal(size=(8, 128)).astype(np.float32)
    e = rng.normal(size=(256, 128)).astype(np.float32)
    mask = (rng.random(256) > 0.3).astype(np.int32)

    expected = np.asarray(dense_scores(jnp.asarray(q), jnp.asarray(e)))
    expected = np.where(mask[None, :] > 0, expected, -1e30)
    try:
        got = np.asarray(pallas_masked_scores(
            jnp.asarray(q), jnp.asarray(e), jnp.asarray(mask), block_n=128))
    except Exception as exc:  # pallas unsupported on this backend
        pytest.skip(f"pallas unavailable: {exc}")
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_pallas_fused_topk_matches_xla():
    import jax.numpy as jnp

    from domain_rag_system_tpu.ops.dense_topk import (
        cosine_topk, pallas_fused_topk)

    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 128)).astype(np.float32)
    e = rng.normal(size=(512, 128)).astype(np.float32)
    mask = (rng.random(512) > 0.3).astype(np.int32)

    ref_s, ref_i = cosine_topk(jnp.asarray(q), jnp.asarray(e), 10,
                               mask=jnp.asarray(mask))
    try:
        got_s, got_i = pallas_fused_topk(
            jnp.asarray(q), jnp.asarray(e), jnp.asarray(mask), 10,
            block_n=128)
    except Exception as exc:  # pallas unsupported on this backend
        pytest.skip(f"pallas unavailable: {exc}")
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)
    # ties may order differently across tile boundaries; compare score sets
    # exactly and indices where scores are unique
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_int8_quantized_index_matches_f32_ranking(toy_chunks):
    emb = MedicalEmbedder(dim=512)
    f32 = DenseIndex(emb, row_block=8)
    f32.index_chunks(toy_chunks)
    q8 = DenseIndex(emb, row_block=8, dtype="int8")
    q8.index_chunks(toy_chunks)
    assert q8.embeddings.dtype.name == "int8"

    for query in ["diabetes insulin treatment", "pain relief", "cholesterol"]:
        _, idx_f = f32.search_batch([query], top_k=5)
        _, idx_q = q8.search_batch([query], top_k=5)
        # int8 quantization noise may swap distant ties; top-3 must agree
        np.testing.assert_array_equal(idx_f[0][:3], idx_q[0][:3])

    # scores close to f32
    s_f, _ = f32.search_batch(["diabetes"], top_k=3)
    s_q, _ = q8.search_batch(["diabetes"], top_k=3)
    np.testing.assert_allclose(s_q, s_f, atol=0.02)


def test_int8_through_fused_pipeline(toy_chunks):
    from domain_rag_system_tpu.indexing import BM25Index, HybridIndex
    from domain_rag_system_tpu.pipeline import RetrievalPipeline
    from domain_rag_system_tpu.reranker import SimpleSimilarityReranker

    emb = MedicalEmbedder(dim=512)
    h = HybridIndex(dense_index=DenseIndex(emb, row_block=8, dtype="int8"),
                    bm25_index=BM25Index())
    h.index_chunks(toy_chunks)
    p = RetrievalPipeline(h, reranker=SimpleSimilarityReranker(embedder=emb,
                                                               top_n=8))
    out = p.query("treatment for diabetes", top_k=3)
    assert out["num_results"] == 3
    assert "diabetes" in out["results"][0]["text"]
