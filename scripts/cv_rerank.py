#!/usr/bin/env python
"""Out-of-fold supervised cross-encoder: the honest path to a CE that wins.

Round-2 verdict item 4 asked for a cross-encoder that beats no-rerank on
recall@5 AND nDCG@10. Corpus-only distillation (scripts/
distill_cross_encoder.py) reproduced the tuned ranking but never exceeded
it — the student had no signal its teacher lacked. The signal that exists
and was never used: the 200 labeled BioASQ queries themselves, used the
only honest way — 5-fold cross-validation. For each fold, a CE is
fine-tuned on the OTHER 4 folds' (query, gt-chunk) positives with tuned-
stack hard negatives, its (blend, top_n) operating point is selected on
those same training folds, and it reranks only the held-out fold. The
out-of-fold aggregate is an unbiased estimate of reranked quality on
unseen queries (same protocol as scripts/cv_tune.py, verdict item 3).

Efficiency: the tuned chunk-level candidate pools are computed ONCE for
all 200 queries (one batched device pass); per fold the CE scores each
query's top-``pool`` candidates ONCE, and the (blend, top_n) grid is pure
post-processing that mirrors ``BaseReranker.rerank_batch`` +
``_group_first_per_doc`` bit-for-bit (equivalence asserted in
tests/test_cv_rerank.py against the real pipeline path).

Reference bar: ``/root/reference/src/reranker/rerank.py:71-84`` (the
cross-encoder stage this framework must make WIN, not just support).

Usage:
    python scripts/cv_rerank.py --init_from checkpoints/medrag-cross-distill \
        --output results/cv_rerank_oof.json --final_out checkpoints/medrag-cross-sup
"""

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402

from cv_tune import stratified_folds  # noqa: E402


def norm01(vals):
    """Min-max norm, exactly as BaseReranker.rerank_batch does it."""
    lo, hi = min(vals), max(vals)
    span = hi - lo
    return [(v - lo) / span if span > 0 else 0.5 for v in vals]


def apply_rerank_offline(pool, raw_scores, top_n, blend, top_k,
                         evidence_alpha, evidence_chunks):
    """Mirror of the shipping rerank path on a precomputed score vector.

    Replicates ``BaseReranker.rerank_batch`` (pool cut at ``top_n``,
    blend of min-max-normed CE and fusion scores, stable descending sort)
    followed by ``_group_first_per_doc`` — the exact sequence
    ``RetrievalPipeline.finalize_batch`` runs with an external reranker
    (pipeline.py:1029-1045)."""
    from domain_rag_system_tpu.pipeline import _group_first_per_doc

    pool_n = pool[: min(top_n, len(pool))]
    if not pool_n:
        return []
    ps = [float(s) for s in raw_scores[: len(pool_n)]]
    if blend > 0:
        rr_n = norm01(ps)
        fu_n = norm01([float(r.get("score", 0.0)) for r in pool_n])
        final = [(1.0 - blend) * a + blend * b for a, b in zip(rr_n, fu_n)]
    else:
        final = ps
    rescored = []
    for r, raw, f in zip(pool_n, ps, final):
        nr = r.copy()
        nr["rerank_score"] = f
        nr["rerank_raw"] = raw
        rescored.append(nr)
    rescored.sort(key=lambda x: x["rerank_score"], reverse=True)
    return _group_first_per_doc(rescored, top_k,
                                evidence_alpha=evidence_alpha,
                                evidence_chunks=evidence_chunks)


def eval_ranked(q, results):
    """Per-query metrics on a doc-grouped result list."""
    from domain_rag_system_tpu.evaluation.metrics import (
        calculate_retrieval_metrics, hit_at_k, ndcg_at_k, recall_at_k)
    from domain_rag_system_tpu.evaluation.runners import (
        retrieved_doc_ids, strip_source_prefix)

    gt = [strip_source_prefix(str(d)) for d in q.get("documents", [])]
    retrieved = retrieved_doc_ids(results)
    m = calculate_retrieval_metrics(gt, retrieved)
    m["recall@5"] = recall_at_k(gt, retrieved, 5)
    m["ndcg@10"] = ndcg_at_k(gt, retrieved, 10)
    m["hit@1"] = hit_at_k(gt, retrieved, 1)
    return m


def mean_of(per_q, idx, keys=("recall@5", "ndcg@10", "mrr", "recall")):
    return {k: float(np.mean([per_q[i][k] for i in idx])) for k in keys}


def build_groups(q, pool, gt_chunk_texts, rng, group_size, max_pos):
    """[pos, neg...] text groups for one training query.

    Positives: the query's gt-document chunks found in its tuned candidate
    pool (rank order, the retrievable evidence), falling back to the gt
    docs' leading chunks when retrieval missed entirely. Negatives: the
    pool's non-gt candidates — the exact distractors the tuned stack
    ranks high, i.e. the mistakes the CE must learn to demote."""
    from domain_rag_system_tpu.evaluation.runners import (
        retrieved_doc_ids, strip_source_prefix)

    gt = set(strip_source_prefix(str(d)) for d in q.get("documents", []))
    cand_docs = retrieved_doc_ids(pool)
    positives = [r["text"] for r, d in zip(pool, cand_docs) if d in gt]
    negatives = [r["text"] for r, d in zip(pool, cand_docs) if d not in gt]
    if not positives:
        positives = list(gt_chunk_texts)[:2]
    positives = positives[:max_pos]
    if len(negatives) < group_size - 1:
        return []
    groups = []
    n_neg = group_size - 1
    n_hard = (n_neg + 1) // 2
    for pos in positives:
        hard = negatives[:n_hard]
        rest_pool = negatives[n_hard:]
        rest = [rest_pool[i] for i in
                rng.choice(len(rest_pool), size=min(n_neg - n_hard,
                                                    len(rest_pool)),
                           replace=False)] if rest_pool else []
        negs = (hard + rest)[:n_neg]
        while len(negs) < n_neg:
            negs.append(negatives[int(rng.integers(len(negatives)))])
        groups.append([q["body"], pos] + negs)
    return groups


def train_fold_ce(groups, init, steps, lr, group_size, batch_groups,
                  seq_len, seed):
    """Fine-tune a CE on [query, pos, neg...] groups; returns the model."""
    from domain_rag_system_tpu.models.bert_embedder import CrossEncoderModel
    from domain_rag_system_tpu.training.cross_encoder import CrossEncoderTrainer

    config, init_params, tokenizer = init
    trainer = CrossEncoderTrainer(
        config, learning_rate=lr, seed=seed,
        warmup_steps=max(steps // 10, 5), total_steps=steps,
        group_size=group_size)
    trainer.init_state(seq_len=seq_len, init_params=init_params)

    def batches():
        rng = np.random.default_rng(seed)
        while True:
            order = rng.permutation(len(groups))
            for start in range(0, len(order) - batch_groups + 1,
                               batch_groups):
                qs, ps = [], []
                for gi in order[start:start + batch_groups]:
                    g = groups[gi]
                    qs.extend([g[0]] * (len(g) - 1))
                    ps.extend(g[1:])
                ids, mask, types = tokenizer.encode_batch(
                    qs, ps, max_length=seq_len)
                yield {"ids": ids, "mask": mask, "types": types}

    history = trainer.train(itertools.islice(batches(), steps), log_every=50)
    model = CrossEncoderModel(config=config, params=trainer.state.params,
                              tokenizer=tokenizer, max_length=seq_len)
    return model, history[-1]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default="data/recovered/BioASQ/corpus_subset.json")
    ap.add_argument("--queries", default="data/recovered/BioASQ/bioasq_queries.json")
    ap.add_argument("--init_from", default="checkpoints/medrag-cross-distill",
                    help="CE checkpoint whose trunk/head/tokenizer seed "
                         "each fold's fine-tune")
    ap.add_argument("--profile", default="tuned",
                    choices=["tuned", "quality_small"])
    ap.add_argument("--n_folds", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0,
                    help="fold seed — MUST stay 0 to match cv_tune.py folds")
    ap.add_argument("--pool", type=int, default=60,
                    help="chunk candidates fetched per query (= tuned "
                         "fetch_k top_k*fetch_mult)")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--group_size", type=int, default=8)
    ap.add_argument("--batch_groups", type=int, default=8)
    ap.add_argument("--max_pos", type=int, default=4)
    ap.add_argument("--seq_len", type=int, default=128)
    ap.add_argument("--blends", type=float, nargs="+",
                    default=[0.5, 0.7, 0.85])
    ap.add_argument("--top_ns", type=int, nargs="+", default=[20, 40, 60])
    ap.add_argument("--output", default="results/cv_rerank_oof.json")
    ap.add_argument("--embedding_cache", default=None,
                    help="corpus-embedding cache dir (see cv_tune.py)")
    ap.add_argument("--final_out", default=None,
                    help="also train a deployment CE on ALL queries with "
                         "the modal fold hyperparameters and save here")
    args = ap.parse_args()

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.evaluation.runners import (
        load_queries, strip_source_prefix)
    from domain_rag_system_tpu.persistence.checkpoints import (
        load_encoder_checkpoint, save_encoder_checkpoint)
    from domain_rag_system_tpu.preprocessing import DataLoader, DocumentChunker
    from domain_rag_system_tpu.serving import build_pipeline

    root = Path(__file__).resolve().parent.parent
    cfg = getattr(RetrievalConfig, args.profile)()
    queries = load_queries(root / args.queries)
    docs = DataLoader(pubmed_path=str(root / args.corpus)).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    pipeline, info = build_pipeline(cfg, chunks=chunks,
                                    embedding_cache_dir=args.embedding_cache)
    if cfg.mine_terms:
        pipeline.preprocessor.normalizer.build_drug_mapping_from_data(docs)
    print(f"{len(queries)} queries @ {info['n_chunks']} chunks")

    # gt fallback texts: each doc's leading chunk (for queries whose gt
    # never enters the candidate pool)
    doc_first_chunk = {}
    for c in chunks:
        did = strip_source_prefix(c.doc_id)
        doc_first_chunk.setdefault(did, c.text)

    # ---- ONE batched chunk-level retrieval for every query's pool --------
    kw = cfg.query_kwargs()
    kw.update(top_k=args.pool, group_by_doc=False, rerank_top_n=0)
    for k in ("evidence_alpha", "evidence_chunks", "fetch_mult"):
        kw.pop(k, None)
    pools = []
    B = cfg.batch_size
    t0 = time.time()
    for start in range(0, len(queries), B):
        outs = pipeline.query_batch(
            [q["body"] for q in queries[start:start + B]], **kw)
        pools.extend([o["results"] for o in outs])
    print(f"candidate pools: top-{args.pool} chunks/query in "
          f"{time.time() - t0:.1f}s")

    # ---- offline no-rerank baseline (must match the committed numbers) ---
    qkw = cfg.query_kwargs()
    ev_a, ev_c = qkw.get("evidence_alpha", 0.0), qkw.get("evidence_chunks", 2)
    fetch_k = cfg.top_k * qkw.get("fetch_mult", 4)
    from domain_rag_system_tpu.pipeline import _group_first_per_doc

    base_per_q = [eval_ranked(q, _group_first_per_doc(
        p[:fetch_k], cfg.top_k, evidence_alpha=ev_a, evidence_chunks=ev_c))
        for q, p in zip(queries, pools)]
    all_idx = list(range(len(queries)))
    print("offline no-rerank baseline:",
          json.dumps({k: round(v, 4)
                      for k, v in mean_of(base_per_q, all_idx).items()}))

    init = load_encoder_checkpoint(root / args.init_from)
    seq_len = min(args.seq_len, init[0].max_position_embeddings)

    fold_of = stratified_folds(queries, args.n_folds, args.seed)
    grid = [(b, n) for n in args.top_ns for b in args.blends]
    folds_out = []
    oof_ce = {"recall@5": [], "ndcg@10": [], "mrr": [], "recall": []}
    oof_base = {"recall@5": [], "ndcg@10": [], "mrr": [], "recall": []}
    for f in range(args.n_folds):
        train_idx = np.flatnonzero(fold_of != f)
        test_idx = np.flatnonzero(fold_of == f)
        rng = np.random.default_rng(args.seed + 100 + f)
        groups = []
        for i in train_idx:
            gt_docs = [strip_source_prefix(str(d))
                       for d in queries[i].get("documents", [])]
            fallback = [doc_first_chunk[d] for d in gt_docs
                        if d in doc_first_chunk]
            groups.extend(build_groups(queries[i], pools[i], fallback, rng,
                                       args.group_size, args.max_pos))
        t0 = time.time()
        model, last = train_fold_ce(
            groups, init, args.steps, args.lr, args.group_size,
            args.batch_groups, seq_len, seed=args.seed + f)
        print(f"fold {f}: {len(groups)} groups, {args.steps} steps in "
              f"{time.time() - t0:.1f}s (loss={last['loss']:.3f} "
              f"acc={last['accuracy']:.3f})")

        # score every query's pool once with this fold's CE
        flat = [(queries[i]["body"], r.get("text", "") or "")
                for i in all_idx for r in pools[i]]
        t0 = time.time()
        scores = model.predict(flat)
        print(f"  scored {len(flat)} pairs in {time.time() - t0:.1f}s")
        per_q_scores, off = [], 0
        for i in all_idx:
            per_q_scores.append(scores[off:off + len(pools[i])])
            off += len(pools[i])

        # select (blend, top_n) on the TRAIN folds only
        def point_metrics(blend, top_n, idx):
            per = {i: eval_ranked(queries[i], apply_rerank_offline(
                pools[i], per_q_scores[i], top_n, blend, cfg.top_k,
                ev_a, ev_c)) for i in idx}
            return per

        best, best_score, best_train = None, -1.0, None
        for blend, top_n in grid:
            per = point_metrics(blend, top_n, list(train_idx))
            m = mean_of(list(per.values()), range(len(per)))
            s = 0.5 * (m["recall@5"] + m["ndcg@10"])
            if s > best_score:
                best, best_score, best_train = (blend, top_n), s, m
        blend, top_n = best
        held_per = point_metrics(blend, top_n, list(test_idx))
        held = mean_of(list(held_per.values()), range(len(held_per)))
        held_base = mean_of(base_per_q, list(test_idx))
        folds_out.append({
            "fold": f, "selected": {"blend": blend, "top_n": top_n},
            "train_ce": {k: round(v, 4) for k, v in best_train.items()},
            "heldout_ce": {k: round(v, 4) for k, v in held.items()},
            "heldout_none": {k: round(v, 4) for k, v in held_base.items()},
            "n_groups": len(groups), "n_test": int(len(test_idx)),
        })
        for k in oof_ce:
            oof_ce[k].append(held[k])
            oof_base[k].append(held_base[k])
        print(f"  fold {f}: blend={blend} top_n={top_n} held-out "
              f"r@5 {held['recall@5']:.4f} vs {held_base['recall@5']:.4f} | "
              f"ndcg {held['ndcg@10']:.4f} vs {held_base['ndcg@10']:.4f}")

    agg = lambda d: {k: round(float(np.mean(v)), 4) for k, v in d.items()}
    out = {
        "protocol": {
            "n_folds": args.n_folds, "seed": args.seed,
            "stratified_by": "question type",
            "init_from": str(args.init_from), "steps": args.steps,
            "lr": args.lr, "group_size": args.group_size,
            "grid": [{"blend": b, "top_n": n} for b, n in grid],
            "selection": "0.5*(recall@5+ndcg@10) on the 4 train folds",
        },
        "profile": args.profile,
        "n_chunks": info["n_chunks"],
        "out_of_fold_ce": agg(oof_ce),
        "out_of_fold_none": agg(oof_base),
        "offline_baseline_all": {
            k: round(v, 4) for k, v in mean_of(base_per_q, all_idx).items()},
        "per_fold": folds_out,
        "wins": {
            "recall@5": bool(np.mean(oof_ce["recall@5"])
                             > np.mean(oof_base["recall@5"])),
            "ndcg@10": bool(np.mean(oof_ce["ndcg@10"])
                            > np.mean(oof_base["ndcg@10"])),
        },
    }
    print("\nOOF CE:  ", json.dumps(out["out_of_fold_ce"]))
    print("OOF none:", json.dumps(out["out_of_fold_none"]))

    if args.final_out:
        # deployment CE: trained on all 200 queries with the modal fold
        # operating point (in-sample by construction; OOF above is the
        # honest estimate of its quality on unseen queries)
        from collections import Counter

        modal = Counter((fo["selected"]["blend"], fo["selected"]["top_n"])
                        for fo in folds_out).most_common(1)[0][0]
        rng = np.random.default_rng(args.seed + 999)
        groups = []
        for i in all_idx:
            gt_docs = [strip_source_prefix(str(d))
                       for d in queries[i].get("documents", [])]
            fallback = [doc_first_chunk[d] for d in gt_docs
                        if d in doc_first_chunk]
            groups.extend(build_groups(queries[i], pools[i], fallback, rng,
                                       args.group_size, args.max_pos))
        model, last = train_fold_ce(
            groups, init, args.steps, args.lr, args.group_size,
            args.batch_groups, seq_len, seed=args.seed)
        save_encoder_checkpoint(root / args.final_out, model.config,
                                model.params["params"], model.tokenizer)
        out["final"] = {"checkpoint": str(args.final_out),
                        "blend": modal[0], "top_n": modal[1],
                        "n_groups": len(groups),
                        "final_loss": round(last["loss"], 4)}
        print(f"deployment CE -> {args.final_out} "
              f"(blend={modal[0]}, top_n={modal[1]})")

    out_path = root / args.output
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
