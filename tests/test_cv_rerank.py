"""Offline CE rerank replication (scripts/cv_rerank.py) vs the pipeline.

The CV rerank protocol scores each query's candidate pool once and sweeps
(blend, top_n) as post-processing. That is only honest if the offline
replica ``apply_rerank_offline`` reproduces the shipping path —
``BaseReranker.rerank_batch`` + ``_group_first_per_doc`` inside
``RetrievalPipeline.finalize_batch`` (pipeline.py:1029-1045) — exactly.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.models import MedicalEmbedder
from domain_rag_system_tpu.pipeline import RetrievalPipeline
from domain_rag_system_tpu.reranker import CrossEncoderReranker


@pytest.fixture(scope="module")
def tiny_ce():
    """Random-init cross-encoder over a tiny vocab (no training needed —
    equivalence is about plumbing, not quality)."""
    from domain_rag_system_tpu.models.bert import BertConfig
    from domain_rag_system_tpu.models.bert_embedder import CrossEncoderModel
    from domain_rag_system_tpu.tokenization import train_wordpiece
    from domain_rag_system_tpu.training.cross_encoder import CrossEncoderTrainer

    texts = ["aspirin dose fever pain relief study",
             "insulin glucose diabetes trial outcome"]
    tok = train_wordpiece(texts, vocab_size=200)
    config = BertConfig(vocab_size=len(tok), hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=64, dtype="float32")
    trainer = CrossEncoderTrainer(config)
    trainer.init_state(seq_len=32)
    return CrossEncoderModel(config=config, params=trainer.state.params,
                             tokenizer=tok, max_length=32)


@pytest.fixture(scope="module")
def corpus_pipeline():
    from domain_rag_system_tpu.preprocessing import Chunk

    rng = np.random.default_rng(0)
    words = ("aspirin fever pain insulin glucose diabetes dose trial "
             "outcome relief study warfarin stroke lipid statin").split()
    chunks = []
    for d in range(12):
        for c in range(3):
            text = " ".join(rng.choice(words, size=12))
            chunks.append(Chunk(chunk_id=f"d{d}_c{c}", doc_id=f"doc{d}",
                                source="pubmed", chunk_type="abstract",
                                text=text, metadata={}))
    emb = MedicalEmbedder(dim=256)
    hybrid = HybridIndex(dense_index=DenseIndex(emb, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(chunks)
    return RetrievalPipeline(hybrid)


@pytest.mark.parametrize("blend,top_n", [(0.0, 8), (0.7, 8), (0.85, 16)])
def test_offline_matches_pipeline_rerank(corpus_pipeline, tiny_ce,
                                         blend, top_n):
    from cv_rerank import apply_rerank_offline

    pipe = corpus_pipeline
    queries = ["aspirin fever dose", "insulin diabetes trial",
               "statin lipid stroke"]
    kw = dict(top_k=4, fusion_method="weighted", vector_weight=0.3,
              bm25_weight=0.7, group_by_doc=True, evidence_alpha=0.5,
              evidence_chunks=2, fetch_mult=4, preprocess=False)

    # offline pools: chunk-level fused ranking, reranker detached
    pipe.reranker = None
    pool_kw = dict(kw)
    pool_kw.update(top_k=16, group_by_doc=False, rerank_top_n=0)
    for k in ("evidence_alpha", "evidence_chunks", "fetch_mult"):
        pool_kw.pop(k)
    pools = [o["results"] for o in pipe.query_batch(queries, **pool_kw)]

    # shipping path: external CE reranker inside finalize_batch
    rr = CrossEncoderReranker.__new__(CrossEncoderReranker)
    rr.top_n, rr.name, rr.blend, rr.model = top_n, "cross-encoder", blend, tiny_ce
    pipe.reranker = rr
    shipped = pipe.query_batch(queries, rerank_top_n=top_n, **kw)
    pipe.reranker = None

    for q, pool, out in zip(queries, pools, shipped):
        raw = tiny_ce.predict([(q, r["text"]) for r in pool])
        offline = apply_rerank_offline(pool, raw, top_n, blend, 4, 0.5, 2)
        assert [r["doc_id"] for r in offline] == \
            [r["doc_id"] for r in out["results"]]
        assert [r["chunk_id"] for r in offline] == \
            [r["chunk_id"] for r in out["results"]]
        np.testing.assert_allclose(
            [r["rerank_score"] for r in offline],
            [r["rerank_score"] for r in out["results"]], rtol=1e-5)


def test_build_groups_layout():
    from cv_rerank import build_groups

    pool = [{"text": f"t{i}", "doc_id": f"doc{i % 5}",
             "chunk_id": f"c{i}", "source": "pubmed", "metadata": {},
             "score": 1.0 - i * 0.01} for i in range(20)]
    q = {"body": "query", "documents": ["doc1", "doc3"]}
    rng = np.random.default_rng(0)
    groups = build_groups(q, pool, ["fallback"], rng, group_size=4,
                          max_pos=3)
    assert groups, "gt docs in pool must yield groups"
    for g in groups:
        assert len(g) == 5  # query + pos + 3 negs
        assert g[0] == "query"
        # positives come from gt docs (doc1/doc3 → texts t1,t3,t6,t8,...)
        pos_idx = int(g[1][1:])
        assert pos_idx % 5 in (1, 3)
        for neg in g[2:]:
            assert int(neg[1:]) % 5 not in (1, 3)

    # no gt in pool → fallback text becomes the positive
    q2 = {"body": "query", "documents": ["doc99"]}
    groups2 = build_groups(q2, pool, ["fallback"], rng, group_size=4,
                           max_pos=3)
    assert groups2 and groups2[0][1] == "fallback"


@pytest.mark.parametrize("blend,m", [(0.0, 3), (0.5, 4)])
def test_head_reorder_offline_matches_pipeline(corpus_pipeline, tiny_ce,
                                               blend, m):
    """Round-4 head-only doc reorder: the pipeline path (reranker with
    head_m set, grouping first) must equal the offline replica
    (grouped baseline + BaseReranker.reorder_head), and the doc SET at
    every cutoff >= m must equal the no-rerank baseline's."""
    pipe = corpus_pipeline
    queries = ["aspirin fever dose", "insulin diabetes trial",
               "statin lipid stroke"]
    kw = dict(top_k=4, fusion_method="weighted", vector_weight=0.3,
              bm25_weight=0.7, group_by_doc=True, evidence_alpha=0.5,
              evidence_chunks=2, fetch_mult=4, preprocess=False)

    pipe.reranker = None
    baseline = pipe.query_batch(queries, **kw)

    rr = CrossEncoderReranker.__new__(CrossEncoderReranker)
    rr.top_n, rr.name, rr.blend, rr.model = 50, "cross-encoder", blend, tiny_ce
    rr.head_m = m
    pipe.reranker = rr
    shipped = pipe.query_batch(queries, **kw)
    pipe.reranker = None

    from domain_rag_system_tpu.reranker.rerank import BaseReranker

    for q, base, out in zip(queries, baseline, shipped):
        grouped = base["results"]
        offline = BaseReranker.reorder_head(rr, [q], [grouped],
                                            m, blend)[0]
        assert [r["doc_id"] for r in offline] == \
            [r["doc_id"] for r in out["results"]]
        # doc set invariance: same docs as baseline at every cutoff >= m
        assert set(r["doc_id"] for r in out["results"]) == \
            set(r["doc_id"] for r in grouped)
        assert [r["doc_id"] for r in out["results"]][m:] == \
            [r["doc_id"] for r in grouped][m:]


def test_reorder_head_edges(tiny_ce):
    """Empty pools, m larger than the list, and blend extremes."""
    from domain_rag_system_tpu.reranker.rerank import BaseReranker
    from domain_rag_system_tpu.reranker import CrossEncoderReranker

    rr = CrossEncoderReranker.__new__(CrossEncoderReranker)
    rr.top_n, rr.name, rr.blend, rr.model = 50, "ce", 0.0, tiny_ce
    rr.head_m = 5

    grouped = [[], [{"text": "aspirin dose", "doc_id": "a", "score": 1.0}]]
    out = BaseReranker.reorder_head(rr, ["q1", "q2"], grouped, 5, 0.0)
    assert out[0] == []                      # empty list passes through
    assert [r["doc_id"] for r in out[1]] == ["a"]  # m > len: whole list
    assert "rerank_score" in out[1][0]

    # blend=1.0 → pure fusion order preserved (doc_score ties the sort)
    g = [{"text": f"t{i}", "doc_id": f"d{i}", "score": 1.0 - 0.1 * i,
          "doc_score": 1.0 - 0.1 * i} for i in range(4)]
    out = BaseReranker.reorder_head(rr, ["q"], [g], 3, 1.0)
    assert [r["doc_id"] for r in out[0]] == ["d0", "d1", "d2", "d3"]
