"""Pipeline + reranker + generation end-to-end on the toy corpus."""

import numpy as np
import pytest

from domain_rag_system_tpu.generation import AnswerGenerator, TemplateGenerator
from domain_rag_system_tpu.generation.generator import build_prompt
from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.models import MedicalEmbedder
from domain_rag_system_tpu.pipeline import RetrievalPipeline
from domain_rag_system_tpu.reranker import (
    SimpleSimilarityReranker,
    build_reranker,
)


@pytest.fixture
def pipeline(toy_chunks):
    embedder = MedicalEmbedder(dim=512)
    hybrid = HybridIndex(
        dense_index=DenseIndex(embedder, row_block=8),
        bm25_index=BM25Index(),
    )
    hybrid.index_chunks(toy_chunks)
    reranker = SimpleSimilarityReranker(embedder=embedder, top_n=8)
    return RetrievalPipeline(hybrid, reranker=reranker)


def test_group_by_doc_returns_distinct_docs():
    """MaxP grouping: top_k counts distinct documents, best chunk per doc,
    rank order preserved (the doc-level control's contract)."""
    from domain_rag_system_tpu.preprocessing import Chunk

    chunks = []
    for d in range(4):
        for c in range(4):
            chunks.append(Chunk(
                chunk_id=f"d{d}_c{c}", doc_id=f"doc{d}", source="pubmed",
                chunk_type="abstract",
                text=f"aspirin dose study part {c} of document {d}"
                     + (" fever pain relief" if d == 1 else ""),
                metadata={}))
    emb = MedicalEmbedder(dim=128)
    hybrid = HybridIndex(dense_index=DenseIndex(emb, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(chunks)
    pipe = RetrievalPipeline(hybrid)

    plain = pipe.query("aspirin fever pain", top_k=4)["results"]
    grouped = pipe.query("aspirin fever pain", top_k=4,
                         group_by_doc=True)["results"]
    # ungrouped: doc1's four matching chunks crowd the list
    assert len({r["doc_id"] for r in plain}) < 4
    # grouped: exactly 4 distinct docs, first doc unchanged
    assert [r["doc_id"] for r in grouped] != [r["doc_id"] for r in plain]
    assert len({r["doc_id"] for r in grouped}) == 4
    assert grouped[0]["doc_id"] == plain[0]["doc_id"]
    # grouping preserves rank order of each doc's best chunk
    assert grouped[0]["chunk_id"] == plain[0]["chunk_id"]
    # batch path agrees with single path
    batched = pipe.query_batch(["aspirin fever pain"], top_k=4,
                               group_by_doc=True)[0]["results"]
    assert [r["chunk_id"] for r in batched] == [r["chunk_id"] for r in grouped]


def test_filtered_queries_ride_fused_batch_path(pipeline):
    """Metadata filters become per-query mask rows in the fused program;
    results must match the host-orchestrated filtered path exactly."""
    f = {"source_tag": "even"}
    fast = pipeline.query("pain treatment", top_k=4, filters=f)
    host = pipeline.query("pain treatment", top_k=4, filters=f,
                          use_batch_path=False)
    assert [r["chunk_id"] for r in fast["results"]] == \
        [r["chunk_id"] for r in host["results"]]
    assert all(r["metadata"]["source_tag"] == "even"
               for r in fast["results"])

    # mixed per-query filters in ONE batch
    outs = pipeline.query_batch(
        ["pain treatment", "pain treatment", "pain treatment"],
        top_k=4,
        filters=[{"source_tag": "even"}, {"source_tag": "odd"}, None])
    assert all(r["metadata"]["source_tag"] == "even"
               for r in outs[0]["results"])
    assert all(r["metadata"]["source_tag"] == "odd"
               for r in outs[1]["results"])
    tags = {r["metadata"]["source_tag"] for r in outs[2]["results"]}
    assert tags == {"even", "odd"}  # unfiltered sees both


def test_pipeline_single_query(pipeline):
    out = pipeline.query("treatment for diabetes", top_k=3)
    assert out["num_results"] == 3
    top = out["results"][0]
    assert "rerank_score" in top
    assert top["fusion_method"].endswith("+rerank")
    assert "diabetes" in top["text"]


def test_pipeline_rerank_uses_original_query(pipeline, monkeypatch):
    captured = {}
    orig = pipeline.reranker.rerank

    def spy(query, results, top_k):
        captured["query"] = query
        return orig(query, results, top_k=top_k)

    monkeypatch.setattr(pipeline.reranker, "rerank", spy)
    # use_batch_path=False keeps the host orchestration path (the fused
    # device path embeds the original query directly — same semantics, no
    # rerank() call)
    pipeline.query("Tx for DM", top_k=2, use_batch_path=False)
    # reranker gets the ORIGINAL query, not the normalized one (reference :160)
    assert captured["query"] == "Tx for DM"


def test_pipeline_batch_matches_single(pipeline):
    queries = ["diabetes treatment", "pain relief", "blood pressure"]
    batch = pipeline.query_batch(queries, top_k=3)
    assert len(batch) == 3
    for q, out in zip(queries, batch):
        single = pipeline.query(q, top_k=3)
        assert [r["chunk_id"] for r in out["results"]] == \
               [r["chunk_id"] for r in single["results"]]


def test_pipeline_no_reranker(toy_chunks):
    hybrid = HybridIndex(bm25_index=BM25Index())
    hybrid.index_chunks(toy_chunks)
    p = RetrievalPipeline(hybrid)
    out = p.query("aspirin fever", top_k=2)
    assert out["num_results"] == 2
    assert "rerank_score" not in out["results"][0]


def test_pipeline_stage_timing(pipeline):
    pipeline.query("anything at all", top_k=2)
    summary = pipeline.timer.summary()
    assert "retrieve" in summary and summary["retrieve"]["count"] >= 1
    # filtered queries now ride the fused batch path too; the host
    # orchestration stage only appears when explicitly requested
    pipeline.query("filtered", top_k=2, filters={"source_tag": "even"},
                   use_batch_path=False)
    assert "search" in pipeline.timer.summary()  # host path stage


# ----------------------------------------------------------------- reranker

def test_build_reranker_kinds(toy_chunks):
    assert build_reranker("none") is None
    simple = build_reranker("simple", top_n=7)
    assert simple.top_n == 7
    # no cross-encoder checkpoint in this env -> fallback to simple
    fallback = build_reranker("crossencoder")
    assert type(fallback).__name__ == "SimpleSimilarityReranker"


def test_reranker_pool_and_tagging(pipeline, toy_chunks):
    results = [
        {"chunk_id": c.chunk_id, "text": c.text, "fusion_method": "rrf",
         "metadata": {}, "score": 1.0 - 0.01 * i}
        for i, c in enumerate(toy_chunks)
    ]
    rr = pipeline.reranker
    out = rr.rerank("diabetes drug", results, top_k=4)
    assert len(out) == 4
    assert all(r["fusion_method"] == "rrf+rerank" for r in out)
    scores = [r["rerank_score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_reranker_empty():
    rr = SimpleSimilarityReranker(embedder=MedicalEmbedder(dim=64))
    assert rr.rerank("q", [], top_k=3) == []


# --------------------------------------------------------------- generation

def test_template_generator(toy_chunks):
    contexts = [{"chunk_id": c.chunk_id, "text": c.text, "source": c.source,
                 "chunk_type": c.chunk_type} for c in toy_chunks[:4]]
    gen = TemplateGenerator()
    out = gen.generate("what treats diabetes?", contexts)
    assert out["answer"].startswith("Based on")
    assert len(out["sources"]) == 3
    assert out["metadata"]["model_type"] == "template"

    empty = gen.generate("q", [])
    assert "No relevant information" in empty["answer"]


def test_prompt_structure():
    contexts = [{"text": "aspirin reduces fever", "source": "pubmed",
                 "chunk_type": "abstract"}]
    prompt = build_prompt("does aspirin reduce fever?", contexts)
    assert "[1] (pubmed/abstract) aspirin reduces fever" in prompt
    assert "Question: does aspirin reduce fever?" in prompt
    assert "1." in prompt and "5." in prompt  # the 5 rules


def test_answer_generator_degrades_without_api():
    gen = AnswerGenerator(model_type="openai", api_key=None)
    out = gen.generate("q", [{"chunk_id": "c1", "text": "t"}])
    assert out["sources"] == ["c1"]
    # either client init failed or the API call failed (no network) —
    # both must degrade to an error-string answer, never raise
    assert out["answer"].startswith("[generation")


def test_pipeline_prf_expansion_runs(pipeline):
    """PRF-expanded batch path returns valid results and can only help or
    reshuffle — never crash or return empty on a matching query."""
    out = pipeline.query_batch(["diabetes treatment"], top_k=5,
                               prf_terms=5, prf_docs=3, prf_alpha=0.6)[0]
    assert out["num_results"] >= 1
    ids = [r["chunk_id"] for r in out["results"]]
    assert "doc2_body" in ids or "doc3_body" in ids


def test_query_stream_matches_query_batch(pipeline, toy_chunks):
    """Software-pipelined streaming (dispatch i+1 overlaps finalize i) is
    bit-identical to plain batching, across batch boundaries and with the
    device reranker engaged."""
    queries = [f"aspirin heart {i}" for i in range(3)] + \
              [f"diabetes insulin {i}" for i in range(4)]
    kwargs = dict(top_k=3, fusion_method="weighted", vector_weight=0.3,
                  bm25_weight=0.7, prf_terms=5, group_by_doc=True)
    batched = pipeline.query_batch(queries, **kwargs)
    streamed = pipeline.query_stream(queries, batch_size=3, **kwargs)
    assert len(streamed) == len(batched) == len(queries)
    for sb, st in zip(batched, streamed):
        assert [r["chunk_id"] for r in sb["results"]] == \
               [r["chunk_id"] for r in st["results"]]
        assert np.allclose([r["score"] for r in sb["results"]],
                           [r["score"] for r in st["results"]])


def test_query_stream_empty_and_single(pipeline):
    assert pipeline.query_stream([], batch_size=4) == []
    out = pipeline.query_stream(["aspirin"], batch_size=4, top_k=2)
    assert len(out) == 1 and out[0]["num_results"] > 0


def test_query_stream_window_sizes_identical(pipeline):
    """Grouped-sync windows (one device pull per max_inflight batches) are
    bit-identical across window sizes — including a window boundary mid-
    stream (7 queries / batch 2 / window 2 → windows of 2, 2 batches + tail)."""
    queries = [f"aspirin heart {i}" for i in range(4)] + \
              [f"diabetes insulin {i}" for i in range(3)]
    kwargs = dict(top_k=3, fusion_method="weighted", vector_weight=0.3,
                  bm25_weight=0.7, prf_terms=5, group_by_doc=True)
    base = pipeline.query_batch(queries, **kwargs)
    for inflight in (1, 2, 100):
        streamed = pipeline.query_stream(queries, batch_size=2,
                                         max_inflight=inflight, **kwargs)
        assert len(streamed) == len(base)
        for sb, st in zip(base, streamed):
            assert [r["chunk_id"] for r in sb["results"]] == \
                   [r["chunk_id"] for r in st["results"]]


def test_evidence_aggregation_grouping():
    """evidence_alpha > 0: a doc with two strong chunks outranks a doc whose
    single chunk scores marginally higher; alpha=0 keeps MaxP order."""
    from domain_rag_system_tpu.pipeline import _group_first_per_doc

    results = [
        {"doc_id": "lucky", "chunk_id": "l0", "score": 1.00},
        {"doc_id": "solid", "chunk_id": "s0", "score": 0.95},
        {"doc_id": "solid", "chunk_id": "s1", "score": 0.90},
        {"doc_id": "solid", "chunk_id": "s2", "score": 0.85},
        {"doc_id": "weak", "chunk_id": "w0", "score": 0.10},
    ]
    maxp = _group_first_per_doc(results, top_k=3)
    assert [r["doc_id"] for r in maxp] == ["lucky", "solid", "weak"]

    agg = _group_first_per_doc(results, top_k=3, evidence_alpha=0.5)
    assert [r["doc_id"] for r in agg] == ["solid", "lucky", "weak"]
    # doc score = best + alpha * sum(next evidence_chunks=2)
    assert agg[0]["doc_score"] == pytest.approx(0.95 + 0.5 * (0.90 + 0.85))
    assert agg[0]["chunk_id"] == "s0"  # best chunk represents the doc

    # rerank_score takes precedence over fusion score when present
    rr = [{"doc_id": "a", "chunk_id": "a0", "score": 0.1, "rerank_score": 2.0},
          {"doc_id": "b", "chunk_id": "b0", "score": 0.9, "rerank_score": 1.0}]
    out = _group_first_per_doc(rr, top_k=2, evidence_alpha=0.3)
    assert [r["doc_id"] for r in out] == ["a", "b"]


def test_fetch_mult_and_evidence_chunks_knobs():
    """fetch_mult deepens the fused pool before doc grouping (a doc whose
    best chunk sits below top_k*4 becomes reachable at fetch_mult=8);
    evidence_chunks widens the per-doc evidence sum."""
    from domain_rag_system_tpu.pipeline import _group_first_per_doc
    from domain_rag_system_tpu.preprocessing import Chunk

    # evidence_chunks: 3rd extra chunk counts only when asked for
    results = [
        {"doc_id": "solid", "chunk_id": f"s{i}", "score": s}
        for i, s in enumerate([0.9, 0.8, 0.7, 0.6])
    ]
    two = _group_first_per_doc(results, top_k=1, evidence_alpha=1.0)
    three = _group_first_per_doc(results, top_k=1, evidence_alpha=1.0,
                                 evidence_chunks=3)
    assert two[0]["doc_score"] == pytest.approx(0.9 + 0.8 + 0.7)
    assert three[0]["doc_score"] == pytest.approx(0.9 + 0.8 + 0.7 + 0.6)

    # fetch_mult: 12 docs x 4 near-identical chunks; at top_k=2 the pool of
    # top_k*fetch_mult chunks holds ~pool/4 distinct docs, so deeper pools
    # surface more docs after grouping
    chunks = []
    for d in range(12):
        for c in range(4):
            chunks.append(Chunk(
                chunk_id=f"d{d}_c{c}", doc_id=f"doc{d}", source="pubmed",
                chunk_type="abstract",
                text=f"metformin glucose trial arm {c} cohort {d}",
                metadata={}))
    emb = MedicalEmbedder(dim=128)
    hybrid = HybridIndex(dense_index=DenseIndex(emb, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(chunks)
    pipe = RetrievalPipeline(hybrid)
    shallow = pipe.query_batch(["metformin glucose"], top_k=2,
                               group_by_doc=True, fetch_mult=4)[0]["results"]
    deep = pipe.query_batch(["metformin glucose"], top_k=2,
                            group_by_doc=True, fetch_mult=8)[0]["results"]
    # both return top_k distinct docs and agree on the best doc
    assert len({r["doc_id"] for r in shallow}) == 2
    assert len({r["doc_id"] for r in deep}) == 2
    assert shallow[0]["doc_id"] == deep[0]["doc_id"]
    # config plumbing: the knobs ride query_kwargs
    from domain_rag_system_tpu.config import RetrievalConfig
    kw = RetrievalConfig(fetch_mult=8, evidence_chunks=3).query_kwargs()
    assert kw["fetch_mult"] == 8 and kw["evidence_chunks"] == 3


def test_device_grouping_matches_general_host_path(toy_chunks):
    """The device-side doc grouping (no-reranker + group_by_doc: MaxP +
    evidence aggregation inside the fused program) must rank and score
    documents identically to the general host path (materialize every
    fused slot, then `_group_first_per_doc`), driven here via a
    passthrough reranker over the same fused pool."""
    emb = MedicalEmbedder(dim=256)
    hybrid = HybridIndex(dense_index=DenseIndex(emb, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(toy_chunks)
    pipe = RetrievalPipeline(hybrid)

    queries = ["aspirin pain fever", "diabetes insulin glucose"]
    kwargs = dict(top_k=3, fusion_method="weighted", vector_weight=0.4,
                  bm25_weight=0.6, group_by_doc=True, evidence_alpha=0.7,
                  evidence_chunks=2, fetch_mult=4)
    handle = pipe.dispatch_batch(queries, **kwargs)
    assert handle["device_grouped"]
    fast = pipe.finalize_batch(handle)

    class _Passthrough:
        top_n = 0

        def rerank_batch(self, qs, all_results, top_k):
            return [r[:top_k] for r in all_results]

    pipe.reranker = _Passthrough()
    try:
        # rerank_top_n=3 keeps fetch_k identical to the device-group run
        # (group_by_doc lifts both to top_k*fetch_mult)
        handle_g = pipe.dispatch_batch(queries, rerank_top_n=3, **kwargs)
        assert not handle_g["device_grouped"]
        general = pipe.finalize_batch(handle_g)
    finally:
        pipe.reranker = None

    assert len(fast) == len(general)
    for a, b in zip(fast, general):
        assert [r["chunk_id"] for r in a["results"]] == \
               [r["chunk_id"] for r in b["results"]]
        for ra, rb in zip(a["results"], b["results"]):
            assert ra["doc_score"] == pytest.approx(rb["doc_score"])
            assert ra["score"] == pytest.approx(rb["score"])
            assert set(ra.keys()) == set(rb.keys())


def test_degenerate_queries_never_crash(pipeline):
    """Empty, whitespace, punctuation-only, huge and unicode queries must
    flow through featurization and the fused program without raising."""
    for q in ["", "   ", "???!!!", "aspirin " * 5000, "ibuprofén 💊 α-blocker"]:
        out = pipeline.query(q, top_k=2)
        assert isinstance(out["results"], list)
    assert pipeline.query_batch([], top_k=2) == []


def test_fused_in_program_encode_matches_separate_encode(toy_chunks):
    """With a BERT dense backend, queries enter the fused program as token
    ids and the forward runs inside it (one dispatch). Rankings and scores
    must equal the separate encode_device path — including the device
    cosine rerank, whose ORIGINAL-query embeddings ride the same forward
    (encode_orig)."""
    import jax
    import jax.numpy as jnp

    from domain_rag_system_tpu.models.bert import BertConfig, SentenceEncoder
    from domain_rag_system_tpu.models.bert_embedder import BertEmbedder
    from domain_rag_system_tpu.tokenization import train_wordpiece

    texts = [c.text for c in toy_chunks]
    tokenizer = train_wordpiece(texts * 2, vocab_size=400)
    config = BertConfig.tiny(vocab_size=len(tokenizer), dropout_rate=0.0)
    module = SentenceEncoder(config)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                         jnp.ones((1, 8), jnp.int32))
    emb = BertEmbedder(config=config, params=params["params"],
                       tokenizer=tokenizer, max_length=64, batch_size=4)
    hybrid = HybridIndex(dense_index=DenseIndex(emb, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(toy_chunks)
    rr = SimpleSimilarityReranker(embedder=emb, top_n=6)
    pipe = RetrievalPipeline(hybrid, reranker=rr)

    queries = ["ASA for pain", "diabetes drug", "blood pressure medication"]

    def run():
        return pipe.query_batch(queries, top_k=4, fusion_method="weighted",
                                vector_weight=0.5, bm25_weight=0.5,
                                prf_terms=3, prf_docs=4)

    fused = run()
    orig_fn = BertEmbedder.program_encoder
    BertEmbedder.program_encoder = lambda self: None  # old two-dispatch path
    try:
        separate = run()
    finally:
        BertEmbedder.program_encoder = orig_fn

    for a, b in zip(fused, separate):
        assert [r["chunk_id"] for r in a["results"]] == \
               [r["chunk_id"] for r in b["results"]]
        np.testing.assert_allclose(
            [r.get("rerank_score", r["score"]) for r in a["results"]],
            [r.get("rerank_score", r["score"]) for r in b["results"]],
            rtol=1e-4)


def test_bm25_type_boost_knob():
    """BM25F-style field prior: bm25_type_boost multiplies title-chunk BM25
    scores inside the fused program. boost=1.0 must be byte-identical to
    not passing the knob (the default program is unchanged); boost>1 lifts
    a title chunk over an abstract chunk that otherwise outscores it."""
    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.preprocessing import Chunk

    chunks = [
        # abstract mentions metformin twice → higher plain BM25 score
        Chunk(chunk_id="abs", doc_id="d_abs", source="pubmed",
              chunk_type="abstract",
              text="metformin dosing and metformin tolerability in adults",
              metadata={}),
        Chunk(chunk_id="ttl", doc_id="d_ttl", source="pubmed",
              chunk_type="title",
              text="metformin glycemic control",
              metadata={}),
        Chunk(chunk_id="other", doc_id="d_o", source="pubmed",
              chunk_type="abstract",
              text="aspirin platelet aggregation cardiovascular",
              metadata={}),
    ]
    hybrid = HybridIndex(bm25_index=BM25Index())  # BM25-only: pure effect
    hybrid.index_chunks(chunks)
    pipe = RetrievalPipeline(hybrid)
    q = ["metformin"]

    base = pipe.query_batch(q, top_k=3, fusion_method="weighted",
                            vector_weight=0.0, bm25_weight=1.0)[0]["results"]
    noop = pipe.query_batch(q, top_k=3, fusion_method="weighted",
                            vector_weight=0.0, bm25_weight=1.0,
                            bm25_type_boost=1.0)[0]["results"]
    assert [(r["chunk_id"], r["score"]) for r in base] == \
           [(r["chunk_id"], r["score"]) for r in noop]
    assert base[0]["chunk_id"] == "abs"  # plain BM25 prefers the abstract

    boosted = pipe.query_batch(q, top_k=3, fusion_method="weighted",
                               vector_weight=0.0, bm25_weight=1.0,
                               bm25_type_boost=3.0)[0]["results"]
    assert boosted[0]["chunk_id"] == "ttl"  # prior lifts the title row
    # non-title ordering below is untouched
    assert [r["chunk_id"] for r in boosted][1:] == ["abs", "other"]

    # traced scalar: a second boost value reuses the same compiled program
    damped = pipe.query_batch(q, top_k=3, fusion_method="weighted",
                              vector_weight=0.0, bm25_weight=1.0,
                              bm25_type_boost=0.5)[0]["results"]
    assert damped[0]["chunk_id"] == "abs"
    # a halved title score still beats the zero-score 'other' chunk
    # (Okapi semantics: zero-score alive docs stay ranked, last)
    assert [r["chunk_id"] for r in damped] == ["abs", "ttl", "other"]

    # config plumbing
    kw = RetrievalConfig(bm25_type_boost=1.25).query_kwargs()
    assert kw["bm25_type_boost"] == 1.25
