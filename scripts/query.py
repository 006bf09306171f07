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
        kind=resolve_reranker_kind(args),
        top_n=(args.rerank_top_n if args.rerank_top_n is not None
               else _REFERENCE_DEFAULTS["rerank_top_n"]),
        cross_model=args.cross_model,
        embedder=hybrid.dense_index.embedder if hybrid.dense_index else None,
    )
    return RetrievalPipeline(hybrid, query_preprocessor=preprocessor,
                             reranker=reranker)


def resolve_reranker_kind(args) -> str:
    """Explicit --reranker_kind > --tuned profile (reranker='none', the
    committed operating point) > the reference-parity default 'simple'."""
    if args.reranker_kind is not None:
        return args.reranker_kind
    if getattr(args, "tuned", False):
        from domain_rag_system_tpu.config import RetrievalConfig

        return RetrievalConfig.tuned().reranker
    return "simple"


def add_query_flags(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--indices_dir", default="data/indices")
    ap.add_argument("--drug_mapping_path", default="data/processed/drug_mapping.json")
    # Retrieval knobs parse with a None sentinel so an explicitly typed
    # value — even one equal to the default — is distinguishable from an
    # untouched flag (--tuned must never override what the user typed).
    ap.add_argument("--top_k", type=int, default=None)
    ap.add_argument("--fusion_method", default=None, choices=["rrf", "weighted"])
    ap.add_argument("--vector_weight", type=float, default=None)
    ap.add_argument("--bm25_weight", type=float, default=None)
    ap.add_argument("--filters", type=json.loads, default=None,
                    help='JSON object, e.g. \'{"source": "pubmed"}\'')
    ap.add_argument("--reranker_kind", default=None,
                    choices=["none", "simple", "crossencoder"],
                    help="default: 'simple' (reference parity), or the "
                         "tuned profile's choice under --tuned")
    ap.add_argument("--rerank_top_n", type=int, default=None)
    ap.add_argument("--cross_model", default="cross-encoder/ms-marco-MiniLM-L-6-v2")
    # Quality knobs beyond the reference's flag surface (defaults = off,
    # preserving reference parity). --tuned flips every knob the user did
    # not type to the committed operating point (RetrievalConfig.tuned()).
    ap.add_argument("--prf_terms", type=int, default=None,
                    help="RM3 pseudo-relevance expansion terms (0 = off)")
    ap.add_argument("--prf_docs", type=int, default=None)
    ap.add_argument("--prf_alpha", type=float, default=None)
    ap.add_argument("--group_by_doc", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="top_k counts distinct documents (best chunk each)")
    ap.add_argument("--evidence_alpha", type=float, default=None)
    ap.add_argument("--evidence_chunks", type=int, default=None)
    ap.add_argument("--fetch_mult", type=int, default=None,
                    help="doc-grouping over-fetch depth "
                         "(pool = top_k*fetch_mult)")
    ap.add_argument("--bm25_type_boost", type=float, default=None,
                    help="BM25F-style field prior: title chunks' BM25 "
                         "scores x boost (1.0 = off)")
    ap.add_argument("--structured", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="parse attribute intent (pregnancy-safe/OTC/"
                         "class/condition/best-rated) into metadata "
                         "filters, boosts and rating-ordered ranking")
    ap.add_argument("--tuned", action="store_true",
                    help="use RetrievalConfig.tuned() for every knob not "
                         "explicitly set on the command line")


#: Reference-parity fallbacks when neither the flag nor --tuned sets a knob
#: (scripts/query.py:183-221 flag surface).
_REFERENCE_DEFAULTS = dict(
    top_k=5, fusion_method="rrf", vector_weight=0.5, bm25_weight=0.5,
    rerank_top_n=50, prf_terms=0, prf_docs=10, prf_alpha=0.6,
    group_by_doc=False, evidence_alpha=0.0, evidence_chunks=2, fetch_mult=4,
    bm25_type_boost=1.0, structured=False,
)


def query_kwargs_from_args(args) -> dict:
    """Retrieval kwargs for ``pipeline.query`` from CLI flags.

    Resolution order per knob: explicitly typed flag > --tuned value >
    reference-parity default."""
    tuned = {}
    if args.tuned:
        from domain_rag_system_tpu.config import RetrievalConfig

        tuned = RetrievalConfig.tuned().query_kwargs()
    kw = {}
    for name, ref_default in _REFERENCE_DEFAULTS.items():
        explicit = getattr(args, name)
        if explicit is not None:
            kw[name] = explicit
        else:
            kw[name] = tuned.get(name, ref_default) if args.tuned else ref_default
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
        args.query, filters=args.filters, **query_kwargs_from_args(args))
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
