"""CLI helper logic (scripts/query.py) — flag/tuned-config resolution."""

import sys
from pathlib import Path

import pytest

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
    # inherits the at-scale operating point (deep pool, standard BM25)
    assert cfg.fetch_mult == 8 and cfg.evidence_chunks == 3
    assert cfg.bm25_k1 == 1.5 and cfg.bm25_b == 0.75
    # swaps in the STACKED dense arm at its CV-selected knobs (greedy
    # forward selection, results/stack*_at_scale.json)
    assert cfg.encoder_checkpoint is None
    names = [Path(ck).name for ck, _ in cfg.encoder_stack]
    assert names == ["medrag-sem", "medrag-pre-6l", "medrag-pre"]
    assert all(w == 1.0 for _, w in cfg.encoder_stack)
    assert cfg.vector_weight == 0.2 and cfg.bm25_weight == 0.8
    # the quality-max profile adds the 8L/768 wide long-pretrain arm at
    # weight ratio 4 (w = 2), vw 0.35 (results/stack4_pre8lw_at_scale.json)
    qmax = RetrievalConfig.quality_max_at_scale()
    assert [Path(ck).name for ck, _ in qmax.encoder_stack] == [
        "medrag-sem", "medrag-pre-6l", "medrag-pre", "medrag-pre-8lw"]
    assert qmax.encoder_stack[-1][1] == pytest.approx(2.0)
    assert qmax.vector_weight == 0.35
    # the small-corpus quality profile: tuned base + the 4-arm stack at
    # its CV-selected vw 0.1 (results/stack4_small.json)
    qs = RetrievalConfig.quality_small()
    assert qs.bm25_k1 == RetrievalConfig.tuned().bm25_k1
    assert len(qs.encoder_stack) == 4 and qs.vector_weight == 0.1


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


def test_kaggle_tuned_profile():
    from domain_rag_system_tpu.config import RetrievalConfig

    cfg = RetrievalConfig.kaggle_tuned()
    # the CV-selected point (results/cv_tune_kaggle.json): unanimous
    # vw 0.3 / PRF off / fetch_mult 6, canonicalized index, top_k 5
    assert (cfg.vector_weight, cfg.bm25_weight) == (0.3, 0.7)
    assert cfg.prf_terms == 0
    assert cfg.fetch_mult == 6
    assert cfg.evidence_alpha == 0.5
    assert cfg.normalize_index is True and cfg.top_k == 5
