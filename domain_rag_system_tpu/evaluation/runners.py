"""Dataset evaluation runners.

Parity with the reference's in-process RAG eval loops
(``evaluation/comprehensive_evaluation.py:233-744``): rebuild the pipeline,
run every query, time it, normalize retrieved chunk ids to the dataset's
ground-truth doc-id space, score with the shared metric functions.

ID-normalization rules reproduced from the reference:
  * strip the per-source prefixes ``pubmed_/openfda_/kaggle_`` from doc ids
    (``:334-341``, ``:664-669``);
  * BioASQ ground truth arrives as PubMed URLs → bare ids (``:609-612``),
    with a metadata ``pubmed_id`` fallback for non-numeric ids
    (``:671-686``).

Kaggle quirk handling (SURVEY.md §2.3 quirk 1): the reference's Kaggle eval
scores 0.0 because ground-truth ids live in the ETL's chunk-id space while
the system retrieves its own chunk ids. Runners here score **doc-level** ids
after prefix stripping — which fixes the quirk when the ground truth is
doc-level — and report the id spaces used so parity claims stay honest.

Defaults match the reference: top_k=10 (BioASQ/OpenFDA) or 5 (Kaggle),
fusion=rrf, reranker=simple, rerank_top_n=50 (``run_bioasq_evaluation.py:23-31``).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Sequence

from domain_rag_system_tpu.evaluation.metrics import (
    calculate_retrieval_metrics,
    hit_at_k,
    mean_metrics,
    ndcg_at_k,
    recall_at_k,
)
from domain_rag_system_tpu.pipeline import RetrievalPipeline
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

_PREFIXES = ("pubmed_", "openfda_", "kaggle_")


def strip_source_prefix(doc_id: str) -> str:
    for prefix in _PREFIXES:
        if doc_id.startswith(prefix):
            return doc_id[len(prefix):]
    return doc_id


def retrieved_doc_ids(results: Sequence[Dict]) -> List[str]:
    """Chunk results → ordered doc-id list (prefix-stripped, duplicates kept —
    the metric layer dedups, reference semantics)."""
    out = []
    for r in results:
        doc_id = r.get("doc_id", "")
        pid = r.get("metadata", {}).get("pubmed_id")
        stripped = strip_source_prefix(doc_id)
        # Non-numeric pubmed doc ids fall back to metadata pubmed_id
        # (reference :671-686).
        if pid and not stripped.isdigit() and doc_id.startswith("pubmed_"):
            stripped = str(pid)
        out.append(stripped)
    return out


def run_retrieval_evaluation(
    pipeline: RetrievalPipeline,
    queries: Sequence[Dict],
    top_k: int = 10,
    fusion_method: str = "rrf",
    vector_weight: float = 0.5,
    bm25_weight: float = 0.5,
    rerank_top_n: int = 50,
    batch_size: int = 0,
    extra_ks: Sequence[int] = (1, 3, 5, 10),
    dataset: str = "dataset",
    warmup: bool = True,
    group_by_doc: bool = False,
    stream: bool = False,
    **pipeline_kwargs,
) -> Dict:
    """Evaluate retrieval over queries: [{id, body, type?, documents}].

    ``batch_size > 0`` runs the pipeline's batched device path (the
    throughput configuration); 0 evaluates query-at-a-time (the latency
    configuration, matching how the reference measures per-query time).
    ``warmup`` runs one untimed batch first so one-time XLA compiles don't
    pollute the timing (results are identical either way).
    ``group_by_doc`` returns ``top_k`` distinct documents (best chunk per
    doc) — the same contract as the doc-level dense control.
    ``stream`` (with ``batch_size > 0``) runs the software-pipelined
    executor (``RetrievalPipeline.query_stream``): dispatch of batch i+1
    overlaps finalization of batch i. Results are bit-identical; per-query
    times are then wall-clock averages (batch boundaries overlap).
    """
    per_query: List[Dict] = []
    if warmup and queries:
        first = [q["body"] for q in queries[: max(batch_size, 1)]]
        if batch_size > 0:
            pipeline.query_batch(first, top_k=top_k, fusion_method=fusion_method,
                                 vector_weight=vector_weight,
                                 bm25_weight=bm25_weight,
                                 rerank_top_n=rerank_top_n,
                                 group_by_doc=group_by_doc, **pipeline_kwargs)
        else:
            pipeline.query(first[0], top_k=top_k, fusion_method=fusion_method,
                           vector_weight=vector_weight, bm25_weight=bm25_weight,
                           rerank_top_n=rerank_top_n, group_by_doc=group_by_doc,
                           **pipeline_kwargs)
        # drop warmup (compile-inflated) samples so StageTimer means
        # reported by bench/scale_bench/healthz reflect steady state
        pipeline.timer.totals.clear()
        pipeline.timer.counts.clear()
    t_start = time.perf_counter()

    def evaluate_one(q: Dict, results: List[Dict], elapsed: float) -> Dict:
        gt = [strip_source_prefix(str(d)) for d in q.get("documents", [])]
        retrieved = retrieved_doc_ids(results)
        metrics = calculate_retrieval_metrics(gt, retrieved)
        metrics["recall@5"] = recall_at_k(gt, retrieved, 5)
        metrics["ndcg@10"] = ndcg_at_k(gt, retrieved, 10)
        if gt:
            # ceiling-normalized recall@5 (R-precision-style): with
            # COMPLETE ground truth, recall@5 is bounded by min(5,|gt|)/|gt|
            # — a query with 40 legitimate answers caps at 0.125 for every
            # system. The normalized metric reads "fraction of the
            # achievable top-5 realized", so by-type rows dominated by
            # large-gt queries aren't misread as weakness (measured: the
            # kaggle attribute/class/condition rows sit AT their ceilings
            # under structured retrieval).
            ceiling = min(5, len(gt)) / len(gt)
            metrics["recall@5_norm"] = metrics["recall@5"] / ceiling
        for k in extra_ks:
            metrics[f"hit@{k}"] = hit_at_k(gt, retrieved, k)
        return {
            "id": q.get("id", ""),
            "query": q.get("body", ""),
            "type": q.get("type", ""),
            "ground_truth_ids": gt,
            "retrieved_ids": retrieved,
            "retrieved_chunk_ids": [r.get("chunk_id", "") for r in results],
            "query_time": elapsed,
            "metrics": metrics,
        }

    if batch_size > 0 and stream:
        t0 = time.perf_counter()
        outs = pipeline.query_stream(
            [q["body"] for q in queries], batch_size=batch_size,
            top_k=top_k, fusion_method=fusion_method,
            vector_weight=vector_weight, bm25_weight=bm25_weight,
            rerank_top_n=rerank_top_n, group_by_doc=group_by_doc,
            **pipeline_kwargs,
        )
        dt = (time.perf_counter() - t0) / max(len(queries), 1)
        for q, out in zip(queries, outs):
            per_query.append(evaluate_one(q, out["results"], dt))
    elif batch_size > 0:
        for start in range(0, len(queries), batch_size):
            batch = list(queries[start:start + batch_size])
            t0 = time.perf_counter()
            outs = pipeline.query_batch(
                [q["body"] for q in batch],
                top_k=top_k, fusion_method=fusion_method,
                vector_weight=vector_weight, bm25_weight=bm25_weight,
                rerank_top_n=rerank_top_n,
                group_by_doc=group_by_doc, **pipeline_kwargs,
            )
            dt = (time.perf_counter() - t0) / max(len(batch), 1)
            for q, out in zip(batch, outs):
                per_query.append(evaluate_one(q, out["results"], dt))
    else:
        for q in queries:
            t0 = time.perf_counter()
            out = pipeline.query(
                q["body"], top_k=top_k, fusion_method=fusion_method,
                vector_weight=vector_weight, bm25_weight=bm25_weight,
                rerank_top_n=rerank_top_n, group_by_doc=group_by_doc,
                **pipeline_kwargs,
            )
            dt = time.perf_counter() - t0
            per_query.append(evaluate_one(q, out["results"], dt))

    wall = time.perf_counter() - t_start
    overall = mean_metrics([p["metrics"] for p in per_query])
    overall["avg_query_time"] = (
        sum(p["query_time"] for p in per_query) / len(per_query) if per_query else 0.0
    )
    overall["total_queries"] = len(per_query)
    overall["wall_time_s"] = wall
    overall["queries_per_second"] = len(per_query) / wall if wall > 0 else 0.0

    by_type: Dict[str, Dict] = {}
    types = {p["type"] for p in per_query if p["type"]}
    for qtype in sorted(types):
        subset = [p["metrics"] for p in per_query if p["type"] == qtype]
        agg = mean_metrics(subset)
        agg["total_queries"] = len(subset)
        by_type[qtype] = agg

    log.info(
        "%s: %d queries, recall@5=%.3f ndcg@10=%.3f mrr=%.3f %.2f q/s",
        dataset, len(per_query), overall.get("recall@5", 0.0),
        overall.get("ndcg@10", 0.0), overall.get("mrr", 0.0),
        overall["queries_per_second"],
    )
    return {
        "dataset": dataset,
        "config": {
            "top_k": top_k,
            "fusion_method": fusion_method,
            "vector_weight": vector_weight,
            "bm25_weight": bm25_weight,
            "rerank_top_n": rerank_top_n,
            "batch_size": batch_size,
            "stream": stream,
            "group_by_doc": group_by_doc,
            "reranker": getattr(pipeline.reranker, "name", "none"),
        },
        "overall": overall,
        "by_type": by_type,
        "per_query": per_query,
    }


def load_queries(path) -> List[Dict]:
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    if isinstance(data, dict) and "questions" in data:
        data = data["questions"]
    return data


def save_results(results: Dict, path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=2, ensure_ascii=False)
    log.info("wrote %s", path)
