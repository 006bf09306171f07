#!/usr/bin/env python
"""Throughput at the reference's production scale (91,853 chunks).

The recovered BioASQ corpus yields ~3.4k chunks; this benchmark pads the
index to the reference's full indexed-corpus size
(``preprocessing_stats.json``: 91,853 chunks) with synthetic distractor
chunks, then measures end-to-end batched retrieval over the 200-query eval.
Quality metrics remain meaningful (ground truth lives in the real part;
distractors only make ranking harder).

Configuration: ``RetrievalConfig.tuned()`` + CLI overrides — shared with
bench.py and scripts/evaluate.py.

Usage:
    python scripts/scale_bench.py [--n_chunks 91853] [--dense_dtype int8]
        [--encoder_checkpoint checkpoints/medrag-sem]
        [--output results/scale_bench_sem_f32.json]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import (  # noqa: E402
    describe_devices,
    enable_compilation_cache,
)

enable_compilation_cache()

from domain_rag_system_tpu.config import RetrievalConfig  # noqa: E402
from domain_rag_system_tpu.evaluation.runners import (  # noqa: E402
    load_queries,
    run_retrieval_evaluation,
)
from domain_rag_system_tpu.preprocessing import (  # noqa: E402
    DataLoader,
    DocumentChunker,
)
from domain_rag_system_tpu.etl.synthetic import synthetic_chunks  # noqa: E402
from domain_rag_system_tpu.serving import build_pipeline  # noqa: E402

def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_chunks", type=int, default=91853)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--embedding_dim", type=int, default=None)
    ap.add_argument("--dense_dtype", "--dtype", dest="dense_dtype", default=None,
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--encoder_checkpoint", "--checkpoint",
                    dest="encoder_checkpoint", default=None,
                    help="trained encoder checkpoint dir; 'none' forces the "
                         "lexical-hash embedder")
    ap.add_argument("--vector_weight", type=float, default=None)
    ap.add_argument("--bm25_weight", type=float, default=None)
    ap.add_argument("--prf_terms", type=int, default=None)
    ap.add_argument("--fetch_mult", type=int, default=None,
                    help="doc-grouping over-fetch depth (pool = "
                         "top_k*fetch_mult)")
    ap.add_argument("--evidence_chunks", type=int, default=None)
    ap.add_argument("--bm25_band", type=int, default=None,
                    help="dense-band size (top-K df terms via MXU matmul)")
    ap.add_argument("--topk_approx", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="TPU approx_max_k candidate top-k (PartialReduce)")
    ap.add_argument("--embedding_cache", default=None,
                    help="directory caching the corpus embedding matrix "
                         "(see cv_tune.py)")
    ap.add_argument("--output", default=None,
                    help="also write the JSON line to this file")
    ap.add_argument("--stream", action="store_true",
                    help="software-pipelined executor: dispatch of batch "
                         "i+1 overlaps finalization of batch i")
    ap.add_argument("--passes", type=int, default=3,
                    help="timed passes; the median is reported (tunnel "
                         "dispatch jitter)")
    ap.add_argument("--profile", default="tuned_at_scale",
                    choices=["tuned", "tuned_at_scale", "quality_at_scale",
                             "quality_max_at_scale", "quality_small"],
                    help="base config before CLI overrides; use 'tuned' to "
                         "confirm small-corpus operating points on chip")
    ap.add_argument("--all_corpora", action="store_true",
                    help="index all three recovered corpora (reference's "
                         "mixed production composition) before padding")
    args = ap.parse_args()
    if args.passes < 1:
        ap.error("--passes must be >= 1")

    cfg = getattr(RetrievalConfig, args.profile)().apply_overrides(args)
    if cfg.encoder_checkpoint == "none":
        cfg.encoder_checkpoint = None
    # term mining over 91k synthetic chunks adds build time without
    # affecting the padded-distractor measurement — mine the real part only
    # (build_pipeline already restricts mining to real chunks).

    root = Path(__file__).resolve().parent.parent
    if args.all_corpora:
        # the reference's production index mixes all three corpora
        # (8,907 docs — preprocessing_stats.json); recovered OpenFDA and
        # Kaggle docs become REAL cross-domain distractors for the BioASQ
        # queries, a harder (more faithful) setting than synthetic rows
        loader = DataLoader(
            pubmed_path=str(root / "data/recovered/BioASQ/corpus_subset.json"),
            openfda_path=str(root / "data/recovered/OpenFDA/openfda_corpus.json"),
            kaggle_path=str(root / "data/recovered/kaggle/extracted_docs.json"),
        )
        docs = loader.load_all()
    else:
        docs = DataLoader(
            pubmed_path=str(root / "data/recovered/BioASQ/corpus_subset.json")
        ).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    extra = synthetic_chunks(max(args.n_chunks - len(chunks), 0))
    queries = load_queries(root / "data/recovered/BioASQ/bioasq_queries.json")

    pipeline, info = build_pipeline(cfg, chunks=chunks, extra_chunks=extra,
                                    embedding_cache_dir=args.embedding_cache)
    # drug mapping needs the docs (chunks were prebuilt)
    if cfg.mine_terms:
        pipeline.preprocessor.normalizer.build_drug_mapping_from_data(docs)

    # median-of-N: dispatch latency through the remote tunnel jitters
    # run-to-run (observed ±15% on identical code); the median reflects
    # expected throughput rather than the luckiest draw. Quality metrics
    # are identical across passes (same protocol as bench.py).
    all_passes = [run_retrieval_evaluation(
        pipeline, queries, batch_size=cfg.batch_size, stream=args.stream,
        dataset=f"bioasq@{info['n_chunks']}", warmup=(i == 0),
        **cfg.query_kwargs()) for i in range(args.passes)]
    ranked = sorted(all_passes,
                    key=lambda r: r["overall"]["queries_per_second"])
    results = ranked[len(ranked) // 2]
    o = results["overall"]
    line = {
        "metric": "bioasq200_qps_at_scale",
        "n_chunks": info["n_chunks"],
        "n_real_chunks": info["n_real_chunks"],
        "value": round(o["queries_per_second"], 2),
        "unit": "queries/sec",
        "qps_all_passes": [round(p["overall"]["queries_per_second"], 1)
                           for p in all_passes],
        "recall@5": round(o["recall@5"], 4),
        "ndcg@10": round(o["ndcg@10"], 4),
        "recall": round(o["recall"], 4),
        "mrr": round(o["mrr"], 4),
        "index_build_s": info["index_build_s"],
        "avg_query_latency_ms": round(o["avg_query_time"] * 1000, 3),
        "dense_dtype": cfg.dense_dtype,
        "stream": args.stream,
        "encoder": info["encoder"],
        "config": cfg.to_dict(),
        "devices": describe_devices(),
        # where the time goes: host featurization vs device dispatch vs
        # result materialization, per pipeline stage
        "stage_timing": {k: round(v["mean_s"] * 1000, 3)
                         for k, v in pipeline.timer.summary().items()},
    }
    print(json.dumps(line))
    if args.output:
        out = Path(args.output)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(line, indent=1))


if __name__ == "__main__":
    main()
