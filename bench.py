#!/usr/bin/env python
"""End-to-end benchmark: BioASQ 200-query hybrid retrieval on one chip.

Measures the full serving path (preprocess → dense top-k → BM25+PRF →
weighted fusion → doc-level grouping) over the recovered BioASQ corpus,
batched, and prints ONE JSON line:

    {"metric": "bioasq200_e2e_qps", "value": <queries/sec>, "unit":
     "queries/sec", "vs_baseline": <value / 0.705>, ...quality metrics...}

Baseline: the reference RAG system's measured 1.418 s/query (≈0.705 q/s) on
the same 200-query eval (BASELINE.md, `results/comprehensive_evaluation.json`
bioasq.overall.avg_query_time). Quality metrics (recall@5 / nDCG@10 / MRR)
are reported alongside; corpus provenance (recovered, ~92% gt coverage) in
data/recovered/.

Configuration: ``RetrievalConfig.tuned()`` — the SAME config object
scripts/evaluate.py and scripts/scale_bench.py consume (no config drift).
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

from domain_rag_system_tpu.utils.jaxtools import (  # noqa: E402
    describe_devices,
    enable_compilation_cache,
)

enable_compilation_cache()

REFERENCE_RAG_QPS = 1.0 / 1.418  # reference avg 1.418 s/query on BioASQ-200


REFERENCE_N_CHUNKS = 91_853  # preprocessing_stats.json production index size


def main() -> None:
    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.evaluation.runners import (
        load_queries,
        run_retrieval_evaluation,
    )
    from domain_rag_system_tpu.serving import build_pipeline

    corpus_path = ROOT / "data" / "recovered" / "BioASQ" / "corpus_subset.json"
    queries_path = ROOT / "data" / "recovered" / "BioASQ" / "bioasq_queries.json"
    if not corpus_path.exists():
        from domain_rag_system_tpu.etl import (
            recover_bioasq_corpus, recover_bioasq_queries)

        recover_bioasq_corpus(output_path=corpus_path)
        recover_bioasq_queries(output_path=queries_path)

    cfg = RetrievalConfig.tuned()
    pipeline, info = build_pipeline(
        cfg, corpus_kwargs={"pubmed_path": str(corpus_path)},
        embedding_cache_dir=str(ROOT / "data" / "embcache"))
    queries = load_queries(queries_path)

    # Warmup: compile every program in the batched path.
    kwargs = cfg.query_kwargs()
    pipeline.query_batch([q["body"] for q in queries[:cfg.batch_size]], **kwargs)

    # Timed passes, report the MEDIAN: dispatch latency through the
    # remote-TPU tunnel jitters run-to-run (measured 260-480 q/s on an
    # identical config); the median reflects expected throughput rather
    # than the luckiest draw (all passes are recorded alongside).
    # Quality metrics are identical across passes. At-scale phases run
    # n=5 passes and additionally report the IQR (VERDICT r3 item 7:
    # variance-bounded headline).
    def median_pass(passes):
        ranked = sorted(passes,
                        key=lambda r: r["overall"]["queries_per_second"])
        return ranked[len(ranked) // 2]

    def qps_spread(passes):
        """(all passes, [p25, p75]) of queries/sec, nearest-rank."""
        vals = sorted(round(p["overall"]["queries_per_second"], 1)
                      for p in passes)
        n = len(vals)
        return vals, [vals[max((n - 1) // 4, 0)], vals[min(3 * n // 4, n - 1)]]

    def stage_delta(before, after, wall_s):
        """Per-stage totals accumulated by exactly the measured passes,
        with coverage = timed fraction of the passes' wall time. 'rerank'
        is a nested sub-interval of 'finalize' and is excluded from the
        coverage sum (the only stage overlap)."""
        rows = {}
        for name, a in after.items():
            b = before.get(name, {"total_s": 0.0, "count": 0})
            total = a["total_s"] - b["total_s"]
            count = a["count"] - b["count"]
            if count <= 0 and total <= 0:
                continue
            rows[name] = {"total_ms": round(total * 1000, 1),
                          "count": count,
                          "mean_ms": round(total / count * 1000, 3)
                          if count else 0.0}
        timed = sum(r["total_ms"] for n, r in rows.items() if n != "rerank")
        return {"per_stage": rows,
                "wall_ms": round(wall_s * 1000, 1),
                "timed_ms": round(timed, 1),
                "coverage": round(timed / (wall_s * 1000), 3)
                if wall_s else 0.0,
                "note": ("dispatch = async program enqueue incl. transport "
                         "backpressure stalls; window_pull = one grouped "
                         "device sync per max_inflight window (count = "
                         "windows); finalize = host result materialization "
                         "per batch")}

    passes = [run_retrieval_evaluation(
        pipeline, queries, batch_size=cfg.batch_size, dataset="bioasq",
        warmup=False, stream=True, **kwargs) for _ in range(3)]
    overall = median_pass(passes)["overall"]
    qps = overall["queries_per_second"]

    # Phase 2 — the SAME eval at the reference's production index size
    # (91,853 chunks: real corpus + deterministic distractors), so the
    # recorded artifact carries the at-scale number, not just the easy
    # small-corpus one (VERDICT round-1 item 2).
    from domain_rag_system_tpu.etl.synthetic import synthetic_chunks
    from domain_rag_system_tpu.preprocessing import DataLoader, DocumentChunker

    docs = DataLoader(pubmed_path=str(corpus_path)).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    extra = synthetic_chunks(max(REFERENCE_N_CHUNKS - len(chunks), 0))
    # scale-aware operating point: the stacked TRIPLE-encoder dense arm +
    # the at-scale BM25 point (5-fold CV: results/cv_tune_at_scale.json,
    # results/stack_sweep_at_scale.json, results/stack3_pre_at_scale.json;
    # on-chip confirm results/scale_bench_stack3.json — 1,414 q/s at
    # recall@5 0.5599 / nDCG@10 0.8156, same throughput as one encoder
    # because the fused program overlaps the extra forwards)
    try:
        cfg_big = RetrievalConfig.quality_at_scale()
    except FileNotFoundError:  # encoder checkpoints absent: degrade, log
        cfg_big = RetrievalConfig.tuned_at_scale()
    kwargs_big = cfg_big.query_kwargs()
    pipeline_big, info_big = build_pipeline(
        cfg_big, chunks=chunks, extra_chunks=extra,
        embedding_cache_dir=str(ROOT / "data" / "embcache"))
    if cfg_big.mine_terms:
        pipeline_big.preprocessor.normalizer.build_drug_mapping_from_data(docs)
    pipeline_big.query_batch(
        [q["body"] for q in queries[:cfg_big.batch_size]], **kwargs_big)
    stages_before = pipeline_big.timer.summary()
    passes_big = [run_retrieval_evaluation(
        pipeline_big, queries, batch_size=cfg_big.batch_size,
        dataset=f"bioasq@{info_big['n_chunks']}", warmup=False, stream=True,
        **kwargs_big) for _ in range(5)]
    stages_big = stage_delta(
        stages_before, pipeline_big.timer.summary(),
        sum(p["overall"]["wall_time_s"] for p in passes_big))
    big = median_pass(passes_big)["overall"]
    big_qps = big["queries_per_second"]

    # Phase 3 — the quality-MAX profile at the same 91,853-chunk scale
    # (the 4-arm stacked dense arm incl. the 8L/768 wide long-pretrain
    # encoder; results/stack4_pre8lw_at_scale.json): the best ranking the
    # framework ships — measured 1,253 q/s at recall@5 0.5714 / nDCG@10
    # 0.8395, ~7% under the 3-arm Pareto point. Secondary key; headline
    # stays the Pareto throughput point above.
    qmax = None
    try:
        cfg_max = RetrievalConfig.quality_max_at_scale()
    except FileNotFoundError:
        cfg_max = None
    if cfg_max is not None:
        kwargs_max = cfg_max.query_kwargs()
        pipeline_max, info_max = build_pipeline(
            cfg_max, chunks=chunks, extra_chunks=extra,
            embedding_cache_dir=str(ROOT / "data" / "embcache"))
        pipeline_max.query_batch(
            [q["body"] for q in queries[:cfg_max.batch_size]], **kwargs_max)
        passes_max = [run_retrieval_evaluation(
            pipeline_max, queries, batch_size=cfg_max.batch_size,
            dataset=f"bioasq@{info_max['n_chunks']}qmax", warmup=False,
            stream=True, **kwargs_max) for _ in range(5)]
        qm = median_pass(passes_max)["overall"]
        qmax_passes, qmax_iqr = qps_spread(passes_max)
        qmax = {
            "qps": round(qm["queries_per_second"], 3),
            "recall@5": round(qm["recall@5"], 4),
            "ndcg@10": round(qm["ndcg@10"], 4),
            "recall": round(qm["recall"], 4),
            "mrr": round(qm["mrr"], 4),
            "hit@1": round(qm.get("hit@1", 0.0), 4),
            "hit@10": round(qm.get("hit@10", 0.0), 4),
            "encoder": info_max["encoder"],
            "qps_all_passes": qmax_passes,
            "qps_iqr": qmax_iqr,
        }

    # HEADLINE = the production-scale figure (91,853 chunks — the
    # reference's own index size, preprocessing_stats.json). The easy
    # small-corpus number is secondary (VERDICT round-2 item 2).
    line = {
        "metric": "bioasq200_e2e_qps_at_91853_chunks",
        "value": round(big_qps, 3),
        "unit": "queries/sec",
        "vs_baseline": round(big_qps / REFERENCE_RAG_QPS, 2),
        "n_chunks": info_big["n_chunks"],
        "recall@5": round(big["recall@5"], 4),
        "ndcg@10": round(big["ndcg@10"], 4),
        "mrr": round(big["mrr"], 4),
        "hit@10": round(big.get("hit@10", 0.0), 4),
        "recall": round(big["recall"], 4),
        "avg_query_latency_ms": round(big["avg_query_time"] * 1000, 3),
        "index_build_s": info_big["index_build_s"],
        "qps_all_passes": qps_spread(passes_big)[0],
        "qps_iqr": qps_spread(passes_big)[1],
        "n_passes": len(passes_big),
        "dense_dtype": (
            "int8" if pipeline_big.index.dense_index.quantize
            else str(pipeline_big.index.dense_index.dtype.__name__)),
        "stage_timing": stages_big,
        "small_corpus": {
            "n_chunks": info["n_chunks"],
            "qps": round(qps, 3),
            "recall@5": round(overall["recall@5"], 4),
            "ndcg@10": round(overall["ndcg@10"], 4),
            "recall": round(overall["recall"], 4),
            "mrr": round(overall["mrr"], 4),
            "hit@10": round(overall.get("hit@10", 0.0), 4),
            "avg_query_latency_ms": round(overall["avg_query_time"] * 1000, 3),
            "index_build_s": info["index_build_s"],
            "qps_all_passes": [round(p["overall"]["queries_per_second"], 1)
                               for p in passes],
        },
        "quality_max_at_scale": qmax,
        "encoder": info_big["encoder"],
        "encoder_small_corpus": info["encoder"],
        "config": {k: v for k, v in cfg_big.to_dict().items()
                   if k in ("fusion_method", "vector_weight", "bm25_weight",
                            "prf_terms", "group_by_doc", "bm25_k1", "bm25_b",
                            "mine_terms", "bm25_band")},
        "small_corpus_config": {k: v for k, v in cfg.to_dict().items()
                                if k in ("bm25_k1", "bm25_b")},
        "devices": describe_devices(),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
