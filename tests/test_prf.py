"""RM3 PRF expansion op: numeric correctness against a hand computation."""

import jax.numpy as jnp
import numpy as np

from domain_rag_system_tpu.ops.prf import bm25_prf_expand


def test_prf_expansion_hand_computed():
    # 3 docs, vocab 6. doc0: terms {0:1.0, 1:0.5}; doc1: {1:2.0};
    # doc2: {2:0.1} (low scoring)
    doc_terms = jnp.asarray([[0, 1, -1], [1, -1, -1], [2, -1, -1]], jnp.int32)
    doc_contrib = jnp.asarray([[1.0, 0.5, 0.0], [2.0, 0.0, 0.0],
                               [0.1, 0.0, 0.0]], jnp.float32)
    # first-pass scores make doc0, doc1 the feedback set
    first = jnp.asarray([[10.0, 10.0, 0.0]], jnp.float32)
    q_ids = jnp.asarray([[0, -2]], jnp.int32)
    q_w = jnp.asarray([[1.0, 0.0]], jnp.float32)

    new_ids, new_w = bm25_prf_expand(
        doc_terms, doc_contrib, first, q_ids, q_w,
        fb_docs=2, fb_terms=2, alpha=0.6, vocab_size=6)
    new_ids = np.asarray(new_ids)[0]
    new_w = np.asarray(new_w)[0]

    # original terms kept at alpha * weight
    assert new_ids[0] == 0 and np.isclose(new_w[0], 0.6)
    # feedback mass: softmax over equal scores = 0.5/0.5;
    # term1: 0.5*0.5 + 0.5*2.0 = 1.25; term0: 0.5*1.0 = 0.5; term2 excluded
    exp = {int(i): float(w) for i, w in zip(new_ids[2:], new_w[2:]) if i >= 0}
    assert set(exp) == {0, 1}
    total = 1.25 + 0.5
    # weights = (1-alpha) * mass/total * sum(orig weights=1)
    assert np.isclose(exp[1], 0.4 * 1.25 / total, rtol=1e-5)
    assert np.isclose(exp[0], 0.4 * 0.5 / total, rtol=1e-5)


def test_prf_no_feedback_signal():
    # all-zero first-pass scores: expansion mass ~0 -> weights ~0, ids valid
    doc_terms = jnp.asarray([[0, -1], [1, -1]], jnp.int32)
    doc_contrib = jnp.zeros((2, 2), jnp.float32)
    first = jnp.zeros((1, 2), jnp.float32)
    q_ids = jnp.asarray([[0]], jnp.int32)
    q_w = jnp.asarray([[1.0]], jnp.float32)
    new_ids, new_w = bm25_prf_expand(
        doc_terms, doc_contrib, first, q_ids, q_w,
        fb_docs=2, fb_terms=2, vocab_size=4)
    assert np.asarray(new_w)[0, 1:].max() <= 1e-6 + 0.6  # only alpha*orig
    assert (np.asarray(new_ids)[0, 1:] == -2).all() or \
           np.asarray(new_w)[0, 1:].max() < 1e-6


def test_prf_skipped_when_feedback_set_is_whole_index(caplog):
    """RM3 expansion over a feedback set that equals the corpus carries
    corpus statistics instead of relevance signal (observed flipping the
    ranking on a toy index). When prf_docs >= live chunks, the pipeline
    must skip expansion — results identical to prf_terms=0."""
    from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
    from domain_rag_system_tpu.models import MedicalEmbedder
    from domain_rag_system_tpu.pipeline import RetrievalPipeline
    from domain_rag_system_tpu.preprocessing import Chunk

    chunks = [
        Chunk(chunk_id=f"c{i}", doc_id=f"d{i}", source="pubmed",
              chunk_type="abstract", text=t, metadata={})
        for i, t in enumerate([
            "aspirin reduces mortality after myocardial infarction",
            "metformin treats type 2 diabetes mellitus",
            "insulin therapy for diabetes management",
            "statin therapy lowers cholesterol",
        ])
    ]
    emb = MedicalEmbedder(dim=128)
    hybrid = HybridIndex(dense_index=DenseIndex(emb, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(chunks)
    pipe = RetrievalPipeline(hybrid)

    kw = dict(top_k=2, fusion_method="weighted", vector_weight=0.1,
              bm25_weight=0.9, preprocess=False)
    with_prf = pipe.query_batch(["myocardial infarction treatment"],
                                prf_terms=15, prf_docs=20, **kw)[0]
    without = pipe.query_batch(["myocardial infarction treatment"],
                               prf_terms=0, **kw)[0]
    assert [r["chunk_id"] for r in with_prf["results"]] == \
           [r["chunk_id"] for r in without["results"]]
    assert with_prf["results"][0]["chunk_id"] == "c0"
