#!/usr/bin/env python
"""Sweep reranker operating points (kind × blend × top_n) on BioASQ-200.

Builds the tuned pipeline ONCE, then swaps rerankers in place and re-runs
the retrieval evaluation for each setting, so a full grid costs one index
build plus cheap eval passes. Reports recall@5 / nDCG@10 / MRR / hit@1
deltas vs the no-rerank baseline (VERDICT round-1 item 3: the CE must beat
no-rerank on recall@5 AND nDCG@10 before the tuned config may enable it).

Usage:
    python scripts/rerank_sweep.py --cross_checkpoint checkpoints/medrag-cross3 \
        --blends 0.5 0.7 0.8 0.9 --top_ns 10 20 50 \
        --output results/rerank_sweep.json
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from domain_rag_system_tpu.config import RetrievalConfig  # noqa: E402
from domain_rag_system_tpu.evaluation.runners import (  # noqa: E402
    load_queries,
    run_retrieval_evaluation,
)
from domain_rag_system_tpu.reranker import CrossEncoderReranker  # noqa: E402
from domain_rag_system_tpu.serving import build_pipeline  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent
METRICS = ("recall@5", "ndcg@10", "mrr", "hit@1", "recall", "queries_per_second")


def eval_point(pipeline, queries, cfg, rerank_top_n):
    kwargs = cfg.query_kwargs()
    kwargs["rerank_top_n"] = rerank_top_n
    res = run_retrieval_evaluation(
        pipeline, queries, batch_size=cfg.batch_size, dataset="bioasq",
        warmup=False, **kwargs)
    return {m: round(res["overall"][m], 4) for m in METRICS}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default=str(ROOT / "data/recovered/BioASQ/corpus_subset.json"))
    ap.add_argument("--queries", default=str(ROOT / "data/recovered/BioASQ/bioasq_queries.json"))
    ap.add_argument("--cross_checkpoint", default=str(ROOT / "checkpoints/medrag-cross3"))
    ap.add_argument("--blends", type=float, nargs="+", default=[0.5, 0.7, 0.8, 0.9])
    ap.add_argument("--top_ns", type=int, nargs="+", default=[10, 20, 50])
    ap.add_argument("--output", default=None)
    ap.add_argument("--profile", default="tuned",
                    choices=["tuned", "quality_small"],
                    help="pipeline profile the sweep (and its no-rerank "
                         "baseline) runs on — compare the CE against the "
                         "stack that would actually serve with it")
    args = ap.parse_args()

    cfg = getattr(RetrievalConfig, args.profile)()
    pipeline, info = build_pipeline(
        cfg, corpus_kwargs={"pubmed_path": args.corpus})
    queries = load_queries(args.queries)

    # warm the fused program with the rerank-pool fetch_k shape
    pipeline.query_batch([q["body"] for q in queries[:cfg.batch_size]],
                         **cfg.query_kwargs())

    rows = []
    base = eval_point(pipeline, queries, cfg, cfg.rerank_top_n)
    rows.append({"setting": "none", **base})
    print(json.dumps(rows[-1]))

    ce = CrossEncoderReranker(checkpoint_path=args.cross_checkpoint)
    for top_n in args.top_ns:
        for blend in args.blends:
            ce.top_n = top_n
            ce.blend = blend
            pipeline.reranker = ce
            point = eval_point(pipeline, queries, cfg, top_n)
            row = {"setting": f"ce@{top_n} blend={blend}",
                   "top_n": top_n, "blend": blend, **point}
            row["d_recall@5"] = round(point["recall@5"] - base["recall@5"], 4)
            row["d_ndcg@10"] = round(point["ndcg@10"] - base["ndcg@10"], 4)
            rows.append(row)
            print(json.dumps(row))

    pipeline.reranker = None
    winners = [r for r in rows[1:]
               if r["d_recall@5"] > 0 and r["d_ndcg@10"] > 0]
    print(f"\n{len(winners)} settings beat no-rerank on BOTH recall@5 and nDCG@10")
    for w in sorted(winners, key=lambda r: -(r["d_recall@5"] + r["d_ndcg@10"])):
        print(json.dumps(w))

    if args.output:
        out = {"checkpoint": str(args.cross_checkpoint),
               "baseline": base, "rows": rows,
               "config": cfg.to_dict(), "build_info": {
                   k: v for k, v in info.items() if k != "config"}}
        Path(args.output).write_text(json.dumps(out, indent=1))
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
