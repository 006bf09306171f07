"""CLI helper logic (scripts/query.py) — flag/tuned-config resolution."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def _parse(argv):
    import argparse

    from query import add_query_flags, query_kwargs_from_args

    ap = argparse.ArgumentParser()
    ap.add_argument("--query")
    add_query_flags(ap)
    args = ap.parse_args(argv)
    return query_kwargs_from_args(args)


def test_defaults_are_reference_shaped():
    kw = _parse(["--query", "x"])
    assert kw["fusion_method"] == "rrf"
    assert kw["prf_terms"] == 0          # PRF off by default (parity)
    assert kw["group_by_doc"] is False


def test_tuned_flag_applies_committed_operating_point():
    from domain_rag_system_tpu.config import RetrievalConfig

    tuned = RetrievalConfig.tuned().query_kwargs()
    kw = _parse(["--query", "x", "--tuned"])
    for name in ("fusion_method", "vector_weight", "bm25_weight",
                 "prf_terms", "prf_docs", "group_by_doc", "evidence_alpha"):
        assert kw[name] == tuned[name], name


def test_explicit_flags_beat_tuned():
    kw = _parse(["--query", "x", "--tuned", "--prf_terms", "3",
                 "--fusion_method", "weighted", "--vector_weight", "0.4"])
    assert kw["prf_terms"] == 3
    assert kw["vector_weight"] == 0.4
    # untouched knobs still take tuned values
    from domain_rag_system_tpu.config import RetrievalConfig

    assert kw["prf_docs"] == RetrievalConfig.tuned().prf_docs


def test_quality_at_scale_profile():
    from domain_rag_system_tpu.config import RetrievalConfig

    cfg = RetrievalConfig.quality_at_scale()
    # inherits the at-scale BM25 point but keeps the SHALLOW pool — with
    # the 6L dense arm the CV selection drops back to fetch_mult=4
    # (results/cv_tune_6l_fm_at_scale.json, scale_bench_6l_fm{4,8}.json)
    assert cfg.fetch_mult == 4 and cfg.evidence_chunks == 2
    assert RetrievalConfig.tuned_at_scale().fetch_mult == 8
    assert cfg.bm25_k1 == 1.5 and cfg.bm25_b == 0.75
    # swaps in the 6L encoder at its CV-selected weight
    assert cfg.encoder_checkpoint and "medrag-pre-6l" in cfg.encoder_checkpoint
    assert cfg.vector_weight == 0.15 and cfg.bm25_weight == 0.85


def test_head_precision_profile():
    from domain_rag_system_tpu.config import RetrievalConfig

    cfg = RetrievalConfig.head_precision()
    # base knobs come from tuned(); the CE head applies when the trained
    # checkpoint exists in the repo (it does here)
    assert cfg.prf_terms == RetrievalConfig.tuned().prf_terms
    assert cfg.reranker == "crossencoder"
    assert cfg.rerank_top_n == 20 and cfg.rerank_blend == 0.5
    assert cfg.cross_checkpoint and "medrag-cross4" in cfg.cross_checkpoint


def test_tuned_applies_profile_reranker():
    """--tuned must apply the tuned profile's reranker ('none'), not the
    reference-parity default 'simple'; an explicit --reranker_kind wins."""
    import argparse

    from query import add_query_flags, resolve_reranker_kind

    def parse(argv):
        ap = argparse.ArgumentParser()
        ap.add_argument("--query")
        add_query_flags(ap)
        return ap.parse_args(argv)

    assert resolve_reranker_kind(parse(["--query", "x"])) == "simple"
    assert resolve_reranker_kind(parse(["--query", "x", "--tuned"])) == "none"
    assert resolve_reranker_kind(
        parse(["--query", "x", "--tuned", "--reranker_kind", "simple"])
    ) == "simple"
