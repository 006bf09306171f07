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


def build_chunk_ict_queries(chunks, max_queries, seed=0, remove_prob=0.9):
    """Chunk-sourced ICT pseudo-queries with KNOWN ground truth.

    Returns (query, gt_chunk_id, train_text) triples: the sampled sentence
    is the query, the chunk it came from is relevant BY CONSTRUCTION (the
    one supervision signal the fusion teacher doesn't have), and
    ``train_text`` is the chunk text with the sentence removed with
    probability ``remove_prob`` (ORQA's trick) so the CE can't reduce the
    ground-truth objective to a substring match."""
    from domain_rag_system_tpu.preprocessing import split_sentences

    rng = np.random.default_rng(seed)
    triples = []
    order = rng.permutation(len(chunks))
    for ci in order:
        chunk = chunks[int(ci)]
        sentences = [s for s in split_sentences(chunk.text)
                     if len(s.strip()) >= 30]
        if len(sentences) < 2:
            continue
        i = int(rng.integers(len(sentences)))
        query = sentences[i].strip()
        if rng.random() < remove_prob:
            train_text = " ".join(s for j, s in enumerate(sentences) if j != i)
        else:
            train_text = chunk.text
        triples.append((query, chunk.chunk_id, train_text))
        if len(triples) >= max_queries:
            break
    return triples


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
    ap.add_argument("--extend_positions", type=int, default=0,
                    help="tile the trunk's learned position table to this "
                         "length (persistence.extend_position_embeddings) "
                         "so the CE reads query+whole-passage pairs — the "
                         "128-position 8L trunk truncates passage tails at "
                         "pair length 128 (cf. the cross4 64→128 tiling, "
                         "PERFORMANCE.md 'Reranking findings')")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--profile", default="tuned",
                    choices=["tuned", "quality_small"],
                    help="teacher pipeline config (quality_small = the "
                         "4-arm stacked profile, the strongest "
                         "small-corpus ranking)")
    ap.add_argument("--gt_weight", type=float, default=0.0,
                    help="weight of the ground-truth softmax term on "
                         "chunk-ICT queries (the signal that can push the "
                         "student past its teacher)")
    ap.add_argument("--gt_frac", type=float, default=0.5,
                    help="fraction of pseudo-queries that are chunk-ICT "
                         "(known ground truth); the rest are teacher-only")
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
    cfg = getattr(RetrievalConfig, args.profile)()
    corpus = json.load(open(root / args.corpus))
    docs = DataLoader(pubmed_path=str(root / args.corpus)).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    pipeline, _ = build_pipeline(cfg, chunks=chunks)

    n_gt = int(args.n_queries * args.gt_frac) if args.gt_weight > 0 else 0
    gt_triples = build_chunk_ict_queries(chunks, n_gt, seed=args.seed)
    plain = build_pseudo_queries(corpus, args.n_queries - len(gt_triples),
                                 seed=args.seed)
    # (query, gt_chunk_id | None, train_text | None)
    all_queries = ([(q, cid, text) for q, cid, text in gt_triples]
                   + [(q, None, None) for q in plain])
    rng0 = np.random.default_rng(args.seed)
    rng0.shuffle(all_queries)
    print(f"{len(all_queries)} pseudo-queries "
          f"({len(gt_triples)} with chunk ground truth)")

    # ---- teacher rankings (batched tuned retrieval, chunk-level) ---------
    kw = cfg.query_kwargs()
    kw.update(top_k=args.group_size, group_by_doc=False, evidence_alpha=0.0)
    kw.pop("rerank_top_n", None)
    teacher = []  # (query, [texts], [scores], gt_slot)
    B = cfg.batch_size
    for start in range(0, len(all_queries), B):
        batch = all_queries[start:start + B]
        outs = pipeline.query_batch([q for q, _, _ in batch],
                                    rerank_top_n=0, **kw)
        for (q, gt_cid, train_text), out in zip(batch, outs):
            texts = [r["text"] for r in out["results"]]
            scores = [r["score"] for r in out["results"]]
            gt_slot = -1
            if gt_cid is not None:
                for slot, r in enumerate(out["results"]):
                    if r["chunk_id"] == gt_cid:
                        gt_slot = slot
                        # ORQA: train on the sentence-removed variant so
                        # the gt objective can't be a substring match
                        texts[slot] = train_text
                        break
            if len(texts) >= 2:
                teacher.append((q, texts, scores, gt_slot))
        if (start // B) % 10 == 0:
            print(f"  teacher {start + len(batch)}/{len(all_queries)}")
    n_hit = sum(1 for t in teacher if t[3] >= 0)
    print(f"{len(teacher)} teacher lists "
          f"({n_hit} with the gt chunk in the candidate pool)")

    # ---- CE training ------------------------------------------------------
    config, init_params, tokenizer = load_encoder_checkpoint(args.init_from)
    if args.extend_positions > config.max_position_embeddings:
        from domain_rag_system_tpu.persistence.checkpoints import (
            extend_position_embeddings,
        )

        bert, config = extend_position_embeddings(
            init_params["bert"], config, args.extend_positions)
        init_params = {**init_params, "bert": bert}
    # pair sequences are capped by the trunk's trained position table
    seq_len = min(args.seq_len, config.max_position_embeddings)

    trainer = CrossEncoderTrainer(
        config, learning_rate=args.lr, seed=args.seed,
        warmup_steps=max(args.steps // 10, 10), total_steps=args.steps,
        group_size=args.group_size, distill=True,
        temperature=args.temperature, gt_weight=args.gt_weight)
    trainer.init_state(seq_len=seq_len, init_params=init_params)

    def batches():
        rng = np.random.default_rng(args.seed)
        G = args.group_size
        while True:
            sel = rng.permutation(len(teacher))
            for start in range(0, len(sel) - args.batch_groups + 1,
                               args.batch_groups):
                qs, ps, ts, gts = [], [], [], []
                for i in sel[start:start + args.batch_groups]:
                    q, texts, scores, gt_slot = teacher[i]
                    texts = texts[:G]
                    scores = scores[:G]
                    pad = G - len(texts)
                    qs.extend([q] * G)
                    ps.extend(texts + [""] * pad)
                    ts.extend(scores + [float("-inf")] * pad)
                    gts.append(gt_slot if gt_slot < len(texts) else -1)
                ids, mask, types = tokenizer.encode_batch(
                    qs, ps, max_length=seq_len)
                yield {"ids": ids, "mask": mask, "types": types,
                       "teacher": np.asarray(ts, np.float32),
                       "gt": np.asarray(gts, np.int32)}

    history = trainer.train(itertools.islice(batches(), args.steps),
                            log_every=25)
    final = history[-1]
    print(f"final: loss={final['loss']:.4f} "
          f"teacher-argmax-acc={final['accuracy']:.3f}"
          + (f" gt-acc={final['gt_accuracy']:.3f}"
             if "gt_accuracy" in final else ""))
    save_encoder_checkpoint(args.out, config, trainer.state.params, tokenizer)
    print(f"checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
