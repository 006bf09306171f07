#!/usr/bin/env python
"""Dense-only flat-index baseline (the FAISS-equivalent control).

Capability parity with the reference's baseline scripts
(``baselines/faiss/FAISS_BioASQ.py``, ``openfda_faiss_test.py``,
``baselines/Qdrant/Qdrant_test.py``): embed ``title + " " + abstract`` per
doc, exact cosine search (their ``IndexFlatIP`` + L2-normalize recipe),
top-k retrieval, P/R/F1/MRR/hit@{1,3,5,10} per query and per question
type, results JSON + summary CSV.

Differences: the index is an HBM matrix scored on device via the same
``cosine_topk`` op as the main system (no FAISS), and the embedder is any
framework embedder (default: lexical-hash; pass an HF checkpoint for a
MiniLM-equivalent run). This gives an apples-to-apples dense-only control
for the hybrid system on identical hardware.
"""

import argparse
import csv
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import (  # noqa: E402
    describe_devices,
    enable_compilation_cache,
)

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from domain_rag_system_tpu.evaluation.metrics import (  # noqa: E402
    calculate_retrieval_metrics,
    hit_at_k,
    mean_metrics,
    ndcg_at_k,
    recall_at_k,
)
from domain_rag_system_tpu.models import MedicalEmbedder  # noqa: E402
from domain_rag_system_tpu.ops.dense_topk import cosine_topk  # noqa: E402


def run_baseline(corpus, queries, embedder, top_k=10):
    texts = [f"{d.get('title', '')} {d.get('abstract', d.get('text', ''))}".strip()
             for d in corpus]
    doc_ids = [str(d["id"]) for d in corpus]
    if hasattr(embedder, "fit"):
        embedder.fit(texts)

    t0 = time.perf_counter()
    emb = embedder.encode(texts)
    n_pad = -(-len(texts) // 256) * 256
    padded = np.zeros((n_pad, emb.shape[1]), np.float32)
    padded[: len(texts)] = emb
    emb_dev = jnp.asarray(padded)
    mask = np.zeros(n_pad, np.uint8)
    mask[: len(texts)] = 1
    mask_dev = jnp.asarray(mask)
    build_s = time.perf_counter() - t0

    results = {}
    for q in queries:
        t0 = time.perf_counter()
        q_emb = jnp.asarray(embedder.encode([q["body"]]))
        scores, idx = cosine_topk(q_emb, emb_dev, min(top_k, len(texts)),
                                  mask=mask_dev)
        elapsed = time.perf_counter() - t0
        idx = np.asarray(idx)[0]
        scores = np.asarray(scores)[0]
        retrieved = [doc_ids[i] for i in idx if 0 <= i < len(doc_ids)]
        gt = [str(d) for d in q.get("documents", [])]
        metrics = calculate_retrieval_metrics(gt, retrieved)
        metrics["recall@5"] = recall_at_k(gt, retrieved, 5)
        metrics["ndcg@10"] = ndcg_at_k(gt, retrieved, 10)
        for k in (1, 3, 5, 10):
            metrics[f"hit@{k}"] = hit_at_k(gt, retrieved, k)
        results[q["id"]] = {
            "query": q["body"],
            "type": q.get("type", ""),
            "ground_truth_ids": gt,
            "retrieved_ids": retrieved,
            "retrieved_docs": [
                {"doc_id": doc_ids[i], "score": float(s)}
                for i, s in zip(idx, scores) if 0 <= i < len(doc_ids)
            ],
            "query_time": elapsed,
            "metrics": metrics,
        }
    return results, build_s


def aggregate(results):
    overall = mean_metrics([r["metrics"] for r in results.values()])
    overall["avg_query_time"] = float(np.mean(
        [r["query_time"] for r in results.values()]))
    by_type = defaultdict(list)
    for r in results.values():
        if r["type"]:
            by_type[r["type"]].append(r["metrics"])
    per_type = {t: mean_metrics(ms) for t, ms in sorted(by_type.items())}
    return overall, per_type


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default="data/recovered/BioASQ/corpus_subset.json")
    ap.add_argument("--queries", default="data/recovered/BioASQ/bioasq_queries.json")
    ap.add_argument("--top_k", type=int, default=10)
    ap.add_argument("--embedding_model", default="lexical-hash")
    ap.add_argument("--embedding_dim", type=int, default=2048)
    ap.add_argument("--output", default="results/jax_flat_baseline_results.json")
    ap.add_argument("--summary_csv", default="results/jax_flat_baseline_summary.csv")
    args = ap.parse_args()

    corpus = json.load(open(args.corpus))
    queries = json.load(open(args.queries))
    if isinstance(queries, dict):
        queries = queries.get("questions", [])
    embedder = MedicalEmbedder(model_name=args.embedding_model,
                               dim=args.embedding_dim)

    results, build_s = run_baseline(corpus, queries, embedder, args.top_k)
    overall, per_type = aggregate(results)

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    json.dump(results, open(out, "w"), indent=1)
    with open(args.summary_csv, "w", newline="") as f:
        writer = csv.writer(f)
        header = ["group", "n", "precision", "recall", "f1", "mrr",
                  "hit@1", "hit@3", "hit@5", "hit@10", "recall@5", "ndcg@10"]
        writer.writerow(header)

        def row(name, n, m):
            writer.writerow([name, n] + [f"{m.get(h, 0.0):.4f}" for h in header[2:]])

        row("overall", len(results), overall)
        for t, m in per_type.items():
            row(t, sum(1 for r in results.values() if r["type"] == t), m)

    print(json.dumps({
        "baseline": "jax-flat-dense",
        "devices": describe_devices(),
        "n_docs": len(corpus), "n_queries": len(results),
        "build_s": round(build_s, 2),
        "overall": {k: round(v, 4) for k, v in overall.items()},
    }, indent=1))


if __name__ == "__main__":
    main()
