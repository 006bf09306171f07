#!/usr/bin/env python
"""Dense-only encoder quality eval on BioASQ-200 (the encoder scoreboard).

Builds a dense-ONLY pipeline (no BM25 arm, no PRF) over the recovered
corpus with the given checkpoint and reports recall@5 / nDCG@10 / MRR —
the number VERDICT round-2 item 1 tracks (medrag-sem baseline: dense-only
recall@5 0.336). Optionally also runs the hybrid tuned config at a given
vector weight for the blend check.

Usage:
    python scripts/eval_encoder.py --checkpoint checkpoints/medrag-pre \
        [--hybrid_weights 0.1 0.2 0.3]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--hybrid_weights", type=float, nargs="*", default=[])
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.evaluation.runners import (
        load_queries,
        run_retrieval_evaluation,
    )
    from domain_rag_system_tpu.preprocessing import DataLoader, DocumentChunker
    from domain_rag_system_tpu.serving import build_pipeline

    root = Path(__file__).resolve().parent.parent
    cfg = RetrievalConfig.tuned()
    cfg.encoder_checkpoint = args.checkpoint

    docs = DataLoader(
        pubmed_path=str(root / "data/recovered/BioASQ/corpus_subset.json")
    ).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    queries = load_queries(root / "data/recovered/BioASQ/bioasq_queries.json")
    pipeline, info = build_pipeline(cfg, chunks=chunks)
    if cfg.mine_terms:
        pipeline.preprocessor.normalizer.build_drug_mapping_from_data(docs)

    out = {"checkpoint": args.checkpoint, "encoder": info["encoder"]}

    # dense-only: vector weight 1, no PRF (PRF is a BM25-arm feature)
    kw = cfg.query_kwargs()
    kw.update(vector_weight=1.0, bm25_weight=0.0, prf_terms=0)
    res = run_retrieval_evaluation(
        pipeline, queries, batch_size=cfg.batch_size, stream=True,
        dataset="dense_only", **kw)
    o = res["overall"]
    out["dense_only"] = {k: round(o[k], 4) for k in
                         ("recall@5", "ndcg@10", "mrr", "recall", "hit@1")}
    print(f"dense-only: recall@5={o['recall@5']:.4f} "
          f"ndcg@10={o['ndcg@10']:.4f} mrr={o['mrr']:.4f}")

    for vw in args.hybrid_weights:
        kw = cfg.query_kwargs()
        kw.update(vector_weight=vw, bm25_weight=round(1 - vw, 3))
        res = run_retrieval_evaluation(
            pipeline, queries, batch_size=cfg.batch_size, stream=True,
            dataset=f"hybrid_vw{vw}", **kw)
        o = res["overall"]
        out[f"hybrid_vw{vw}"] = {k: round(o[k], 4) for k in
                                 ("recall@5", "ndcg@10", "mrr", "recall")}
        print(f"hybrid vw={vw}: recall@5={o['recall@5']:.4f} "
              f"ndcg@10={o['ndcg@10']:.4f} mrr={o['mrr']:.4f}")

    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
