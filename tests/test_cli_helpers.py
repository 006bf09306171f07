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
    # inherits the at-scale operating point (deep pool, standard BM25)
    assert cfg.fetch_mult == 8 and cfg.evidence_chunks == 3
    assert cfg.bm25_k1 == 1.5 and cfg.bm25_b == 0.75
    # swaps in the STACKED dense arm at its CV-selected knobs
    # (results/stack_sweep_at_scale.json + stack3_pre_at_scale.json:
    # every fold chose equal weights / vw=0.2)
    assert cfg.encoder_checkpoint is None
    (ck_a, w_a), (ck_b, w_b), (ck_c, w_c) = cfg.encoder_stack
    assert "medrag-sem" in ck_a and "medrag-pre-6l" in ck_b
    assert ck_c.endswith("medrag-pre")
    assert w_a == w_b == w_c == 1.0
    assert cfg.vector_weight == 0.2 and cfg.bm25_weight == 0.8


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
