"""Evaluation runner + report generation on the toy corpus."""

import json

import pytest

from domain_rag_system_tpu.evaluation.report import (
    baseline_overall,
    compare_with_baseline,
    generate_report,
)
from domain_rag_system_tpu.evaluation.runners import (
    retrieved_doc_ids,
    run_retrieval_evaluation,
    strip_source_prefix,
)
from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.models import MedicalEmbedder
from domain_rag_system_tpu.pipeline import RetrievalPipeline


def test_strip_source_prefix():
    assert strip_source_prefix("pubmed_123") == "123"
    assert strip_source_prefix("openfda_ab-cd") == "ab-cd"
    assert strip_source_prefix("kaggle_xyz") == "xyz"
    assert strip_source_prefix("plain") == "plain"


def test_retrieved_doc_ids_pubmed_fallback():
    results = [
        {"doc_id": "pubmed_9", "metadata": {"pubmed_id": "9"}},
        {"doc_id": "pubmed_weird-id", "metadata": {"pubmed_id": "42"}},
        {"doc_id": "openfda_a1", "metadata": {}},
    ]
    assert retrieved_doc_ids(results) == ["9", "42", "a1"]


@pytest.fixture
def pipeline(toy_chunks):
    h = HybridIndex(
        dense_index=DenseIndex(MedicalEmbedder(dim=256), row_block=8),
        bm25_index=BM25Index(),
    )
    h.index_chunks(toy_chunks)
    return RetrievalPipeline(h)


QUERIES = [
    {"id": "q1", "body": "treatment for type 2 diabetes", "type": "factoid",
     "documents": ["doc2", "doc3"]},
    {"id": "q2", "body": "pain relief drugs", "type": "list",
     "documents": ["doc0", "doc1"]},
    # NB: queries need real lexical overlap with their gt docs — an
    # all-noise query ranks near-tied scores (Δ≈1e-5) whose order can
    # legitimately differ between B=1 and batched matmuls under
    # --xla_allow_excess_precision.
    {"id": "q3", "body": "sertraline for depression", "type": "summary",
     "documents": ["doc8"]},
]


def test_run_retrieval_evaluation_latency_mode(pipeline):
    out = run_retrieval_evaluation(pipeline, QUERIES, top_k=5, dataset="toy")
    assert out["overall"]["total_queries"] == 3
    assert out["overall"]["recall@5"] > 0.5
    assert out["overall"]["queries_per_second"] > 0
    assert set(out["by_type"]) == {"factoid", "list", "summary"}
    pq = out["per_query"][0]
    assert pq["ground_truth_ids"] == ["doc2", "doc3"]
    assert pq["retrieved_ids"]


def test_run_retrieval_evaluation_batch_mode_same_metrics(pipeline):
    lat = run_retrieval_evaluation(pipeline, QUERIES, top_k=5, dataset="toy")
    bat = run_retrieval_evaluation(pipeline, QUERIES, top_k=5, dataset="toy",
                                   batch_size=3)
    for key in ("precision", "recall", "f1", "recall@5", "ndcg@10", "mrr"):
        assert lat["overall"][key] == pytest.approx(bat["overall"][key])


def test_generate_report(tmp_path, pipeline):
    results = run_retrieval_evaluation(pipeline, QUERIES, top_k=5, dataset="toy")
    report = generate_report({"toy": results}, tmp_path,
                             environment={"devices": "cpu-test"})
    assert (tmp_path / "comprehensive_evaluation.json").exists()
    md = (tmp_path / "comprehensive_evaluation_report.md").read_text()
    assert "# Comprehensive Evaluation Report" in md
    assert "recall@5" in md
    assert report["toy"]["overall"]["total_queries"] == 3
    # toy has no reference baseline
    assert report["baseline_comparison"]["toy"] == {"available": False}


def test_baseline_overall_bioasq():
    import pathlib

    if not pathlib.Path("/root/reference/results").exists():
        pytest.skip("reference mount absent")
    overall = baseline_overall("bioasq")
    # BASELINE.md: FAISS BioASQ precision 0.526, recall 0.697, mrr 0.893
    assert overall["precision"] == pytest.approx(0.526, abs=0.01)
    assert overall["recall"] == pytest.approx(0.697, abs=0.01)
    assert overall["mrr"] == pytest.approx(0.893, abs=0.01)
    assert overall["avg_query_time"] == pytest.approx(0.057, abs=0.01)

    cmp_out = compare_with_baseline(
        {"precision": 0.6, "avg_query_time": 0.005}, overall)
    assert cmp_out["available"]
    assert cmp_out["metrics"]["speedup"] > 5


def test_report_includes_same_corpus_control_row(tmp_path, pipeline):
    """When a dataset's control CSV is present in the output dir, the
    report embeds the control's overall row and renders a comparison
    table (VERDICT round-1 item 4's done-criterion)."""
    from domain_rag_system_tpu.evaluation.report import render_markdown
    from domain_rag_system_tpu.evaluation.runners import (
        run_retrieval_evaluation,
    )

    queries = [{"id": "q1", "body": "aspirin pain",
                "documents": ["http://x/pubmed/d0"], "type": "factoid"}]
    results = run_retrieval_evaluation(pipeline, queries, dataset="bioasq")
    (tmp_path / "jax_flat_baseline_summary.csv").write_text(
        "group,n,precision,recall,f1,mrr,hit@1,recall@5,ndcg@10\n"
        "overall,1,0.5,0.6,0.55,0.7,0.6,0.5,0.72\n")
    report = generate_report({"bioasq": results}, tmp_path,
                             reference_results=tmp_path)
    assert report["bioasq"]["same_corpus_control"]["ndcg@10"] == 0.72
    md = render_markdown(report)
    assert "same-corpus dense control" in md
