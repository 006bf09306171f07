#!/usr/bin/env python
"""Listwise cross-encoder distillation from the tuned retrieval stack.

VERDICT round-2 item 4: the CE has capability-parity with the reference's
rerank stage (``src/reranker/rerank.py:71-84``) but never beat no-rerank.
Supervised relevance data does not exist here, but the tuned
fusion+PRF+evidence stack IS a strong ranker — so distill its RANKING into
the CE over corpus-only pseudo-queries (ICT sentences + question-style
keyword queries; no evaluation questions — leakage-free), then let the CE
re-score top candidates with cross-attention the bi-encoder lacks.

Stages:
  1. build the tuned pipeline over the recovered corpus;
  2. generate pseudo-queries; teacher = tuned ``query_batch`` top-G fused
     candidates per query (batched device dispatches);
  3. train the CE with the listwise KL loss
     (``training/cross_encoder.listwise_distill_loss``), trunk
     warm-started from a pretrained bi-encoder checkpoint.

Usage:
    python scripts/distill_cross_encoder.py --init_from checkpoints/medrag-pre \
        --out checkpoints/medrag-cross-distill
"""

import argparse
import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402


def build_pseudo_queries(corpus, max_queries, seed=0):
    """Corpus-only pseudo-queries: ICT sentences (document prose) +
    question-style keyword queries (search phrasing)."""
    from train_encoder import build_pairs  # scripts/train_encoder.py

    from domain_rag_system_tpu.training import build_ict_pairs

    abstracts = [d.get("abstract") or d.get("text") or "" for d in corpus]
    ict = [q for q, _ in build_ict_pairs([a for a in abstracts if a],
                                         seed=seed, max_pairs_per_passage=2)]
    questions = [q for q, _ in build_pairs(corpus, style="question")]
    rng = np.random.default_rng(seed)
    rng.shuffle(ict)
    rng.shuffle(questions)
    half = max_queries // 2
    out = ict[:half] + questions[: max_queries - min(len(ict), half)]
    rng.shuffle(out)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default="data/recovered/BioASQ/corpus_subset.json")
    ap.add_argument("--init_from", required=True,
                    help="bi-encoder checkpoint whose trunk + tokenizer "
                         "seed the CE")
    ap.add_argument("--out", default="checkpoints/medrag-cross-distill")
    ap.add_argument("--n_queries", type=int, default=4000)
    ap.add_argument("--group_size", type=int, default=12,
                    help="teacher candidates per pseudo-query")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch_groups", type=int, default=16,
                    help="query groups per training batch")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--seq_len", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.persistence.checkpoints import (
        load_encoder_checkpoint,
        save_encoder_checkpoint,
    )
    from domain_rag_system_tpu.preprocessing import DataLoader, DocumentChunker
    from domain_rag_system_tpu.serving import build_pipeline
    from domain_rag_system_tpu.training.cross_encoder import CrossEncoderTrainer

    root = Path(__file__).resolve().parent.parent
    cfg = RetrievalConfig.tuned()
    corpus = json.load(open(root / args.corpus))
    docs = DataLoader(pubmed_path=str(root / args.corpus)).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    pipeline, _ = build_pipeline(cfg, chunks=chunks)

    queries = build_pseudo_queries(corpus, args.n_queries, seed=args.seed)
    print(f"{len(queries)} pseudo-queries")

    # ---- teacher rankings (batched tuned retrieval, chunk-level) ---------
    kw = cfg.query_kwargs()
    kw.update(top_k=args.group_size, group_by_doc=False, evidence_alpha=0.0)
    kw.pop("rerank_top_n", None)
    teacher = []  # (query, [texts], [scores])
    B = cfg.batch_size
    for start in range(0, len(queries), B):
        batch = queries[start:start + B]
        outs = pipeline.query_batch(batch, rerank_top_n=0, **kw)
        for q, out in zip(batch, outs):
            texts = [r["text"] for r in out["results"]]
            scores = [r["score"] for r in out["results"]]
            if len(texts) >= 2:
                teacher.append((q, texts, scores))
        if (start // B) % 10 == 0:
            print(f"  teacher {start + len(batch)}/{len(queries)}")
    print(f"{len(teacher)} teacher lists")

    # ---- CE training ------------------------------------------------------
    config, init_params, tokenizer = load_encoder_checkpoint(args.init_from)
    # pair sequences are capped by the trunk's trained position table
    seq_len = min(args.seq_len, config.max_position_embeddings)

    trainer = CrossEncoderTrainer(
        config, learning_rate=args.lr, seed=args.seed,
        warmup_steps=max(args.steps // 10, 10), total_steps=args.steps,
        group_size=args.group_size, distill=True,
        temperature=args.temperature)
    trainer.init_state(seq_len=seq_len, init_params=init_params)

    def batches():
        rng = np.random.default_rng(args.seed)
        G = args.group_size
        while True:
            sel = rng.permutation(len(teacher))
            for start in range(0, len(sel) - args.batch_groups + 1,
                               args.batch_groups):
                qs, ps, ts = [], [], []
                for i in sel[start:start + args.batch_groups]:
                    q, texts, scores = teacher[i]
                    texts = texts[:G]
                    scores = scores[:G]
                    pad = G - len(texts)
                    qs.extend([q] * G)
                    ps.extend(texts + [""] * pad)
                    ts.extend(scores + [float("-inf")] * pad)
                ids, mask, types = tokenizer.encode_batch(
                    qs, ps, max_length=seq_len)
                yield {"ids": ids, "mask": mask, "types": types,
                       "teacher": np.asarray(ts, np.float32)}

    history = trainer.train(itertools.islice(batches(), args.steps),
                            log_every=25)
    print(f"final: loss={history[-1]['loss']:.4f} "
          f"teacher-argmax-acc={history[-1]['accuracy']:.3f}")
    save_encoder_checkpoint(args.out, config, trainer.state.params, tokenizer)
    print(f"checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
