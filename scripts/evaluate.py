#!/usr/bin/env python
"""Comprehensive evaluation CLI: run the retrieval eval on every dataset and
emit the comparison report (the moral equivalent of the reference's
``evaluation/comprehensive_evaluation.py`` main flow).

Usage:
    python scripts/evaluate.py [--datasets bioasq openfda kaggle]
                               [--batch_size 32] [--reranker simple]
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

from domain_rag_system_tpu.evaluation.report import generate_report  # noqa: E402
from domain_rag_system_tpu.evaluation.runners import (  # noqa: E402
    load_queries,
    run_retrieval_evaluation,
    save_results,
)
from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex  # noqa: E402
from domain_rag_system_tpu.models import MedicalEmbedder  # noqa: E402
from domain_rag_system_tpu.pipeline import RetrievalPipeline  # noqa: E402
from domain_rag_system_tpu.preprocessing import (  # noqa: E402
    DataLoader,
    DocumentChunker,
)
from domain_rag_system_tpu.reranker import build_reranker  # noqa: E402

DATASETS = {
    "bioasq": {
        "corpus_kwargs": {"pubmed_path": "data/recovered/BioASQ/corpus_subset.json"},
        "queries": "data/recovered/BioASQ/bioasq_queries.json",
        "top_k": 10,
    },
    "openfda": {
        "corpus_kwargs": {"openfda_path": "data/recovered/OpenFDA/openfda_corpus.json"},
        "queries": "data/recovered/OpenFDA/openfda_test_queries.json",
        "top_k": 10,
    },
    "kaggle": {
        "corpus_kwargs": {"kaggle_path": "data/recovered/kaggle/extracted_docs.json"},
        # The reference's kaggle ground truth is unrecoverable AND broken
        # (disjoint chunk-id spaces scored 0.0 — SURVEY §2.3 quirk 1).
        # Queries are regenerated from the corpus with doc-level ground
        # truth (etl/kaggle.py), making this eval meaningful.
        "queries": "generate",
        "top_k": 5,
    },
}


def build_pipeline_for(corpus_kwargs, args) -> RetrievalPipeline:
    docs = DataLoader(**corpus_kwargs).load_all(missing_ok=True)
    chunks = DocumentChunker().chunk_documents(docs)
    if args.checkpoint:
        embedder = MedicalEmbedder(backend="bert", checkpoint_path=args.checkpoint)
    else:
        embedder = MedicalEmbedder(dim=args.embedding_dim)
    hybrid = HybridIndex(
        dense_index=DenseIndex(embedder),
        bm25_index=BM25Index(),
    )
    hybrid.index_chunks(chunks)
    reranker = build_reranker(args.reranker, top_n=args.rerank_top_n,
                              embedder=embedder)
    return RetrievalPipeline(hybrid, reranker=reranker)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datasets", nargs="+", default=["bioasq", "openfda"],
                    choices=list(DATASETS))
    ap.add_argument("--results_dir", default="results")
    ap.add_argument("--fusion_method", default="rrf", choices=["rrf", "weighted"])
    ap.add_argument("--vector_weight", type=float, default=0.5)
    ap.add_argument("--bm25_weight", type=float, default=0.5)
    ap.add_argument("--reranker", default="simple",
                    choices=["none", "simple", "crossencoder"])
    ap.add_argument("--rerank_top_n", type=int, default=50)
    ap.add_argument("--embedding_dim", type=int, default=2048)
    ap.add_argument("--checkpoint", default=None,
                    help="trained encoder checkpoint dir (e.g. "
                         "checkpoints/medrag-kw); default: lexical-hash")
    ap.add_argument("--batch_size", type=int, default=32,
                    help="0 = per-query latency mode")
    ap.add_argument("--group_by_doc", action="store_true",
                    help="top_k counts distinct documents (best chunk per "
                         "doc), matching the doc-level control's contract")
    ap.add_argument("--force", action="store_true",
                    help="recompute even if result files exist")
    args = ap.parse_args()

    results_dir = Path(args.results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    all_results = {}
    for name in args.datasets:
        cfg = DATASETS[name]
        queries_spec = cfg["queries"]
        if queries_spec == "generate":
            import json as _json

            from domain_rag_system_tpu.etl.kaggle import build_test_queries

            corpus_path = cfg["corpus_kwargs"]["kaggle_path"]
            records = _json.load(open(corpus_path))
            generated = build_test_queries(records)
            gen_path = results_dir / f"{name}_generated_queries.json"
            _json.dump(generated, open(gen_path, "w"), indent=1)
            cfg = {**cfg, "queries": str(gen_path)}
        out_path = results_dir / f"{name}_retrieval_results.json"
        if out_path.exists() and not args.force:
            print(f"[{name}] reusing existing {out_path}")
            all_results[name] = json.load(open(out_path))
            continue
        pipeline = build_pipeline_for(cfg["corpus_kwargs"], args)
        queries = load_queries(cfg["queries"])
        results = run_retrieval_evaluation(
            pipeline, queries,
            top_k=cfg["top_k"],
            fusion_method=args.fusion_method,
            vector_weight=args.vector_weight,
            bm25_weight=args.bm25_weight,
            rerank_top_n=args.rerank_top_n,
            batch_size=args.batch_size,
            group_by_doc=args.group_by_doc,
            dataset=name,
        )
        save_results(results, out_path)
        all_results[name] = results

    report = generate_report(
        all_results, results_dir,
        environment={"devices": describe_devices(),
                     "embedding_dim": args.embedding_dim,
                     "reranker": args.reranker},
    )
    for name, section in report.items():
        if isinstance(section, dict) and "overall" in section:
            o = section["overall"]
            print(f"{name}: recall@5={o.get('recall@5', 0):.3f} "
                  f"ndcg@10={o.get('ndcg@10', 0):.3f} mrr={o.get('mrr', 0):.3f} "
                  f"qps={o.get('queries_per_second', 0):.2f}")


if __name__ == "__main__":
    main()
