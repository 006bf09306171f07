#!/usr/bin/env python
"""Throughput at the reference's production scale (91,853 chunks).

The recovered BioASQ corpus yields ~3.4k chunks; this benchmark pads the
index to the reference's full indexed-corpus size
(``preprocessing_stats.json``: 91,853 chunks) with synthetic distractor
chunks, then measures end-to-end batched retrieval over the 200-query eval.
Quality metrics remain meaningful (ground truth lives in the real part;
distractors only make ranking harder).

Usage:
    python scripts/scale_bench.py [--n_chunks 91853] [--batch_size 50]
"""

import argparse
import itertools
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import (  # noqa: E402
    describe_devices,
    enable_compilation_cache,
)

enable_compilation_cache()

from domain_rag_system_tpu.evaluation.runners import (  # noqa: E402
    load_queries,
    run_retrieval_evaluation,
)
from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex  # noqa: E402
from domain_rag_system_tpu.models import MedicalEmbedder  # noqa: E402
from domain_rag_system_tpu.pipeline import RetrievalPipeline  # noqa: E402
from domain_rag_system_tpu.preprocessing import (  # noqa: E402
    Chunk,
    DataLoader,
    DocumentChunker,
)

_TOPICS = [
    "cardiac", "renal", "hepatic", "neural", "vascular", "immune",
    "metabolic", "skeletal", "pulmonary", "dermal", "ocular", "endocrine",
]
_VERBS = ["modulates", "inhibits", "induces", "suppresses", "regulates",
          "activates", "attenuates", "mediates"]
_NOUNS = ["apoptosis", "angiogenesis", "inflammation", "fibrosis",
          "proliferation", "oxidative stress", "signal transduction",
          "gene expression", "protein folding", "ion transport"]


def synthetic_chunks(n: int, seed: int = 7):
    """Deterministic biomedical-sounding distractor chunks."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        words = [
            f"{rng.choice(_TOPICS)} {rng.choice(_NOUNS)} {rng.choice(_VERBS)}"
            for _ in range(rng.randint(4, 10))
        ]
        text = (f"Study {i}: " + "; ".join(words) +
                f"; compound D{i % 9973} shows {rng.choice(_NOUNS)} effects.")
        out.append(Chunk(
            chunk_id=f"syn_{i}_abstract",
            doc_id=f"syn_{i}",
            source="pubmed",
            chunk_type="abstract",
            text=text,
            metadata={"pubmed_id": f"syn{i}"},
        ))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_chunks", type=int, default=91853)
    ap.add_argument("--batch_size", type=int, default=50)
    ap.add_argument("--embedding_dim", type=int, default=2048)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"])
    args = ap.parse_args()

    root = Path(__file__).resolve().parent.parent
    docs = DataLoader(
        pubmed_path=str(root / "data/recovered/BioASQ/corpus_subset.json")
    ).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    n_real = len(chunks)
    chunks += synthetic_chunks(max(args.n_chunks - n_real, 0))
    queries = load_queries(root / "data/recovered/BioASQ/bioasq_queries.json")

    embedder = MedicalEmbedder(dim=args.embedding_dim)
    hybrid = HybridIndex(dense_index=DenseIndex(embedder, dtype=args.dtype),
                         bm25_index=BM25Index())
    t0 = time.perf_counter()
    hybrid.index_chunks(chunks)
    build_s = time.perf_counter() - t0

    pipeline = RetrievalPipeline(hybrid, reranker=None)
    cfg = dict(fusion_method="weighted", vector_weight=0.1, bm25_weight=0.9)
    results = run_retrieval_evaluation(
        pipeline, queries, top_k=10, batch_size=args.batch_size,
        dataset=f"bioasq@{len(chunks)}", **cfg)
    o = results["overall"]
    print(json.dumps({
        "metric": "bioasq200_qps_at_scale",
        "n_chunks": len(chunks),
        "n_real_chunks": n_real,
        "value": round(o["queries_per_second"], 2),
        "unit": "queries/sec",
        "recall@5": round(o["recall@5"], 4),
        "ndcg@10": round(o["ndcg@10"], 4),
        "mrr": round(o["mrr"], 4),
        "index_build_s": round(build_s, 2),
        "avg_query_latency_ms": round(o["avg_query_time"] * 1000, 3),
        "dense_dtype": args.dtype,
        "devices": describe_devices(),
    }))


if __name__ == "__main__":
    main()
