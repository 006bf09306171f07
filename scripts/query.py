#!/usr/bin/env python
"""Retrieval-only query CLI.

Flag parity with the reference ``scripts/query.py`` (``:183-229``):
--query/--top_k/--fusion_method/--vector_weight/--bm25_weight/--filters/
--reranker_kind/--rerank_top_n/--cross_model/--output.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from domain_rag_system_tpu.persistence import load_index  # noqa: E402
from domain_rag_system_tpu.pipeline import RetrievalPipeline  # noqa: E402
from domain_rag_system_tpu.preprocessing import (  # noqa: E402
    MedicalTermNormalizer,
    QueryPreprocessor,
)
from domain_rag_system_tpu.reranker import build_reranker  # noqa: E402


def build_pipeline(args) -> RetrievalPipeline:
    hybrid = load_index(args.indices_dir)

    normalizer = MedicalTermNormalizer()
    mapping = Path(args.drug_mapping_path)
    if mapping.exists():
        normalizer.load_drug_mapping(str(mapping))
    preprocessor = QueryPreprocessor(medical_normalizer=normalizer)

    reranker = build_reranker(
        kind=args.reranker_kind,
        top_n=args.rerank_top_n,
        cross_model=args.cross_model,
        embedder=hybrid.dense_index.embedder if hybrid.dense_index else None,
    )
    return RetrievalPipeline(hybrid, query_preprocessor=preprocessor,
                             reranker=reranker)


def add_query_flags(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--indices_dir", default="data/indices")
    ap.add_argument("--drug_mapping_path", default="data/processed/drug_mapping.json")
    ap.add_argument("--top_k", type=int, default=5)
    ap.add_argument("--fusion_method", default="rrf", choices=["rrf", "weighted"])
    ap.add_argument("--vector_weight", type=float, default=0.5)
    ap.add_argument("--bm25_weight", type=float, default=0.5)
    ap.add_argument("--filters", type=json.loads, default=None,
                    help='JSON object, e.g. \'{"source": "pubmed"}\'')
    ap.add_argument("--reranker_kind", default="simple",
                    choices=["none", "simple", "crossencoder"])
    ap.add_argument("--rerank_top_n", type=int, default=50)
    ap.add_argument("--cross_model", default="cross-encoder/ms-marco-MiniLM-L-6-v2")
    # Quality knobs beyond the reference's flag surface (defaults = off,
    # preserving reference parity). --tuned flips them all to the committed
    # operating point (RetrievalConfig.tuned()).
    ap.add_argument("--prf_terms", type=int, default=0,
                    help="RM3 pseudo-relevance expansion terms (0 = off)")
    ap.add_argument("--prf_docs", type=int, default=10)
    ap.add_argument("--prf_alpha", type=float, default=0.6)
    ap.add_argument("--group_by_doc", action="store_true",
                    help="top_k counts distinct documents (best chunk each)")
    ap.add_argument("--evidence_alpha", type=float, default=0.0)
    ap.add_argument("--tuned", action="store_true",
                    help="use RetrievalConfig.tuned() for every knob not "
                         "explicitly set on the command line")


def query_kwargs_from_args(args, ap: argparse.ArgumentParser) -> dict:
    """Retrieval kwargs for ``pipeline.query`` from CLI flags; with
    ``--tuned``, flags left at their defaults take the tuned value."""
    kw = dict(
        top_k=args.top_k, fusion_method=args.fusion_method,
        vector_weight=args.vector_weight, bm25_weight=args.bm25_weight,
        rerank_top_n=args.rerank_top_n, prf_terms=args.prf_terms,
        prf_docs=args.prf_docs, prf_alpha=args.prf_alpha,
        group_by_doc=args.group_by_doc, evidence_alpha=args.evidence_alpha,
    )
    if args.tuned:
        from domain_rag_system_tpu.config import RetrievalConfig

        tuned = RetrievalConfig.tuned().query_kwargs()
        for name, val in kw.items():
            if name in tuned and val == ap.get_default(name):
                kw[name] = tuned[name]
    return kw


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--query", required=True)
    ap.add_argument("--output", default=None)
    add_query_flags(ap)
    args = ap.parse_args()

    pipeline = build_pipeline(args)
    t0 = time.time()
    out = pipeline.query(
        args.query, filters=args.filters, **query_kwargs_from_args(args, ap))
    elapsed = time.time() - t0

    print(f"\nQuery: {out['query']}")
    print(f"Search query: {out['search_query']}")
    print(f"{out['num_results']} results in {elapsed * 1000:.1f} ms:\n")
    for i, r in enumerate(out["results"], 1):
        score = r.get("rerank_score", r["score"])
        print(f"{i:2d}. [{score:.4f}] {r['chunk_id']} ({r['source']}/{r['chunk_type']})")
        print(f"     {r['text'][:160]}")

    if args.output:
        with open(args.output, "w", encoding="utf-8") as f:
            json.dump(out, f, indent=2, ensure_ascii=False)
        print(f"\nResults saved to {args.output}")


if __name__ == "__main__":
    main()
