#!/usr/bin/env python
"""Serve the retrieval/RAG stack over HTTP with dynamic micro-batching.

Keeps one warm pipeline per process and batches concurrent clients onto the
fused device program (domain_rag_system_tpu/server.py). The reference has no
serving story — its CLIs rebuild the index connection per invocation.

Usage:
    python scripts/serve.py --corpus data/recovered/BioASQ/corpus_subset.json \
        [--port 8080] [--max_wait_ms 10] [--generator extractive]

    curl -s localhost:8080/healthz
    curl -s -X POST localhost:8080/query \
        -d '{"query": "What treats myocardial infarction?", "top_k": 5}'
    curl -s -X POST localhost:8080/rag \
        -d '{"query": "What treats MI?", "question_type": "factoid"}'
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default="data/recovered/BioASQ/corpus_subset.json",
                    help="PubMed-schema corpus JSON to index at startup")
    ap.add_argument("--bundle", default=None,
                    help="prebuilt index bundle dir (scripts/build_index.py) "
                         "— skips corpus re-embedding at startup")
    ap.add_argument("--openfda_path", default=None)
    ap.add_argument("--kaggle_path", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max_wait_ms", type=float, default=10.0,
                    help="straggler window before a partial batch dispatches")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--encoder_checkpoint", "--checkpoint",
                    dest="encoder_checkpoint", default=None,
                    help="trained encoder checkpoint dir; 'none' forces the "
                         "hash embedder (fast startup)")
    ap.add_argument("--generator", default="extractive",
                    choices=["template", "extractive", "none"])
    ap.add_argument("--http", default="native",
                    choices=["native", "python"],
                    help="web layer: 'native' = C++ epoll front "
                         "(keep-alive, pipelining, HTTP framing off the "
                         "GIL; falls back to python when g++/library is "
                         "unavailable); 'python' = http.server threads")
    ap.add_argument("--profile", default="tuned",
                    choices=["tuned", "tuned_at_scale", "quality_at_scale",
                             "quality_max_at_scale", "quality_small",
                             "head_precision", "kaggle_tuned",
                             "openfda_tuned"],
                    help="tuned = best recall/nDCG at ~1000 q/s (small "
                         "index); tuned_at_scale = the 91k-chunk operating "
                         "point (deeper candidate pool); quality_at_scale = "
                         "3-encoder stacked dense arm, best at-scale "
                         "quality at full throughput; quality_max_at_scale "
                         "= 4-encoder stack, +0.010 nDCG for ~26% q/s; "
                         "head_precision = cross-encoder rerank for the "
                         "best MRR/hit@1 at ~70 q/s")
    args = ap.parse_args()

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.generation import (
        ExtractiveGenerator,
        TemplateGenerator,
    )
    from domain_rag_system_tpu.server import RagServer
    from domain_rag_system_tpu.serving import build_pipeline

    cfg = getattr(RetrievalConfig, args.profile)()
    if args.batch_size:
        cfg.batch_size = args.batch_size
    if args.encoder_checkpoint:
        cfg.encoder_checkpoint = (None if args.encoder_checkpoint == "none"
                                  else args.encoder_checkpoint)
    if args.bundle:
        from domain_rag_system_tpu.persistence import load_index
        from domain_rag_system_tpu.pipeline import RetrievalPipeline
        from domain_rag_system_tpu.preprocessing import QueryPreprocessor
        from domain_rag_system_tpu.reranker import build_reranker

        hybrid = load_index(args.bundle)
        reranker = build_reranker(
            cfg.reranker, top_n=cfg.rerank_top_n,
            embedder=hybrid.dense_index.embedder if hybrid.dense_index else None,
            cross_checkpoint=cfg.cross_checkpoint, blend=cfg.rerank_blend)
        pipeline = RetrievalPipeline(hybrid,
                                     query_preprocessor=QueryPreprocessor(),
                                     reranker=reranker)
        info = {"config": cfg.to_dict(), "bundle": args.bundle,
                "n_chunks": len(hybrid.chunks)}
    else:
        pipeline, info = build_pipeline(cfg, corpus_kwargs={
            "pubmed_path": args.corpus,
            "openfda_path": args.openfda_path,
            "kaggle_path": args.kaggle_path,
        })
    generator = {"template": TemplateGenerator(),
                 "extractive": ExtractiveGenerator(),
                 "none": None}[args.generator]

    # prewarm=True compiles every dispatch-bucket shape (including the
    # filtered-program variants) BEFORE binding the port: no client ever
    # pays an XLA compile, and until the port opens probes get a clean
    # (retryable) refusal instead of hanging in an unserved backlog.
    server = None
    if args.http == "native":
        try:
            from domain_rag_system_tpu.native_http import NativeRagServer

            server = NativeRagServer(pipeline, cfg, generator=generator,
                                     host=args.host, port=args.port,
                                     max_wait_ms=args.max_wait_ms,
                                     index_info=info, prewarm=True)
        except RuntimeError as exc:
            print(f"native http front unavailable ({exc}); "
                  f"falling back to the python front", file=sys.stderr)
    if server is None:
        server = RagServer(pipeline, cfg, generator=generator, host=args.host,
                           port=args.port, max_wait_ms=args.max_wait_ms,
                           index_info=info, prewarm=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
