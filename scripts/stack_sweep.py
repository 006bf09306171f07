#!/usr/bin/env python
"""Sweep the stacked dual-encoder dense arm at a fixed index size.

The dense index stores ``concat(w_a·e_a, w_b·e_b)`` rows (see
models/stacked_embedder.py), so the dense score is ``w_a²·cos_a +
w_b²·cos_b``. The weighted fusion min-max-normalizes the dense arm per
query, which removes the global scale — only the RATIO ``r = (w_b/w_a)²``
affects rankings. This script sweeps ``r`` × ``vector_weight`` with ONE
BM25 build and per-ratio dense-index swaps from cached per-encoder
embedding matrices, then applies the same stratified 5-fold CV protocol
as cv_tune.py (select on 4 folds, score the held-out fold).

``r = 0`` is the pure encoder-A arm — the current production
configuration rides the sweep as its own control.

Usage:
    python scripts/stack_sweep.py --n_chunks 91853 \
        --ratios 0,0.25,0.5,1,2,4 --vw_grid 0.1,0.15,0.2,0.25 \
        --output results/stack_sweep_at_scale.json
"""

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from domain_rag_system_tpu.utils.jaxtools import (  # noqa: E402
    describe_devices,
    enable_compilation_cache,
)

enable_compilation_cache()

import numpy as np  # noqa: E402

from cv_tune import stratified_folds  # noqa: E402


def corpus_key(chunks) -> str:
    h = hashlib.md5()
    for c in chunks:
        h.update(c.chunk_id.encode())
        h.update(c.text.encode("utf-8", "ignore"))
    return h.hexdigest()[:16]


def cached_embeddings(cache_dir: Path, name: str, key: str, embedder,
                      chunks) -> np.ndarray:
    """Per-encoder f32 corpus matrix, disk-cached (NOT dtype-rounded —
    the stack scales and concatenates before the index casts once)."""
    path = cache_dir / f"stackemb_{name}_{key}.npz"
    if path.exists():
        print(f"loaded {name} embeddings from {path}")
        return np.load(path)["e"]
    t0 = time.time()
    parts = []
    for s in range(0, len(chunks), 512):
        parts.append(embedder.encode([c.text for c in chunks[s:s + 512]],
                                     normalize=True))
    e = np.concatenate(parts, axis=0).astype(np.float32)
    cache_dir.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, e=e)
    print(f"encoded {len(chunks)} chunks with {name} in {time.time()-t0:.0f}s")
    return e


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_chunks", type=int, default=91853)
    ap.add_argument("--profile", default="tuned_at_scale")
    ap.add_argument("--stack_a", default="checkpoints/medrag-sem",
                    help="base arm; a comma list is ONE fixed equal-weight "
                         "multi-encoder block (e.g. the adopted 3-stack), "
                         "letting --stack_b sweep a candidate 4th arm")
    ap.add_argument("--stack_b", default="checkpoints/medrag-pre-6l")
    ap.add_argument("--stack_c", default=None,
                    help="optional third encoder: holds (a, b) at "
                         "--rb and sweeps the C ratio over --ratios")
    ap.add_argument("--rb", default="1.0",
                    help="(w_b/w_a)^2 when --stack_c sweeps — a comma "
                         "list sweeps the joint (rb, rc) grid")
    ap.add_argument("--ratios", default="0,0.25,0.5,1,2,4")
    ap.add_argument("--vw_grid", default="0.1,0.15,0.2,0.25")
    ap.add_argument("--cache_dir", default="data/embcache")
    ap.add_argument("--n_folds", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--output", default="results/stack_sweep.json")
    args = ap.parse_args()

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.etl.synthetic import synthetic_chunks
    from domain_rag_system_tpu.evaluation.runners import (
        load_queries,
        run_retrieval_evaluation,
    )
    from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
    from domain_rag_system_tpu.models.embedder import MedicalEmbedder
    from domain_rag_system_tpu.models.stacked_embedder import StackedBertEmbedder
    from domain_rag_system_tpu.pipeline import RetrievalPipeline
    from domain_rag_system_tpu.preprocessing import (
        DataLoader,
        DocumentChunker,
        MedicalTermNormalizer,
        QueryPreprocessor,
    )

    cfg = getattr(RetrievalConfig, args.profile)()
    docs = DataLoader(
        pubmed_path=str(ROOT / "data/recovered/BioASQ/corpus_subset.json")
    ).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    n_real = len(chunks)
    chunks = chunks + list(synthetic_chunks(max(args.n_chunks - n_real, 0)))
    queries = load_queries(ROOT / "data/recovered/BioASQ/bioasq_queries.json")
    key = corpus_key(chunks)
    cache_dir = Path(args.cache_dir)

    # per-encoder corpus matrices (cached once; ratios reuse them).
    # stack_a may be a comma list: ONE fixed base block. Each entry is
    # "path" (weight 1.0) or "path:w" — so an adopted UNEQUAL-weight stack
    # (e.g. quality_max's 8L arm at sqrt(2)) can be the base a candidate
    # arm sweeps against.
    def parse_entry(s):
        if ":" in s:
            p, _, w = s.rpartition(":")
            try:
                return p, float(w)
            except ValueError:
                pass
        return s, 1.0

    base_ckpts = [parse_entry(c) for c in args.stack_a.split(",")]
    ckpts = [p for p, _ in base_ckpts] + [args.stack_b]
    if args.stack_c:
        ckpts.append(args.stack_c)
    st = StackedBertEmbedder([(c, 1.0) for c in ckpts], batch_size=128)
    mats = [cached_embeddings(cache_dir, Path(c).name, key, p, chunks)
            for c, p in zip(ckpts, st.parts)]
    nb = len(base_ckpts)
    e_a = (np.concatenate([w * m for (_, w), m in zip(base_ckpts, mats[:nb])],
                          axis=1)
           if nb > 1 else base_ckpts[0][1] * mats[0])
    e_b = mats[nb]
    e_c = mats[nb + 1] if args.stack_c else None

    # facade for query-time encode; the program path is disabled so ratio
    # changes never recompile (weights apply eagerly in encode_device)
    facade = MedicalEmbedder.__new__(MedicalEmbedder)
    facade.model_name = st.model_name
    facade.batch_size = 128
    facade.max_length = st.max_length
    facade.checkpoint_path = None
    facade.stack = st.stack
    facade._impl = st
    st.program_encoder = lambda: None  # instance shadow: sweep w/o recompile

    normalizer = MedicalTermNormalizer()
    if cfg.mine_terms:
        normalizer.build_drug_mapping_from_data(docs)
        normalizer.mine_terms_from_texts([c.text for c in chunks[:n_real]])
    pre = QueryPreprocessor(medical_normalizer=normalizer)
    bm25 = BM25Index(k1=cfg.bm25_k1, b=cfg.bm25_b, band_k=cfg.bm25_band)
    bm25.index_chunks(chunks)

    ratios = [float(r) for r in args.ratios.split(",")]
    vws = [float(v) for v in args.vw_grid.split(",")]
    rbs = [float(r) for r in str(args.rb).split(",")]
    base_kw = cfg.query_kwargs()

    # weight-combination grid: 2-stack sweeps (rb,) pairs; 3-stack sweeps
    # the joint (rb, rc) grid (rb collapses to one value by default)
    if args.stack_c:
        combos = [(rb, rc) for rb in rbs for rc in ratios]
    else:
        combos = [(r, None) for r in ratios]

    runs = []
    t0 = time.time()
    for ri, (rb, rc) in enumerate(combos):
        base = list(base_ckpts)
        if args.stack_c:
            wb, wc = float(np.sqrt(rb)), float(np.sqrt(rc))
            st.stack = base + [(args.stack_b, wb), (args.stack_c, wc)]
            concat = np.concatenate([e_a, wb * e_b, wc * e_c], axis=1)
        else:
            wb = float(np.sqrt(rb))
            st.stack = base + [(args.stack_b, wb)]
            concat = np.concatenate([e_a, wb * e_b], axis=1)
        dense = DenseIndex(facade, dtype=cfg.dense_dtype)
        dense.index_chunks(chunks, precomputed=concat)
        hybrid = HybridIndex(dense_index=dense, bm25_index=bm25)
        hybrid.chunks = list(chunks)
        pipeline = RetrievalPipeline(hybrid, query_preprocessor=pre)
        for vw in vws:
            kw = dict(base_kw)
            kw["vector_weight"] = vw
            kw["bm25_weight"] = 1.0 - vw
            tag = (f"rb={rb} rc={rc}" if args.stack_c else f"r={rb}")
            res = run_retrieval_evaluation(
                pipeline, queries, batch_size=cfg.batch_size, stream=True,
                dataset=f"stack {tag} vw={vw}", warmup=(ri == 0), **kw)
            per_q = [{"recall@5": p["metrics"]["recall@5"],
                      "ndcg@10": p["metrics"]["ndcg@10"]}
                     for p in res["per_query"]]
            if args.stack_c:
                knobs = {"rb": rb, "ratio": rc, "vector_weight": vw}
            else:
                knobs = {"ratio": rb, "vector_weight": vw}
            runs.append({"knobs": knobs, "per_query": per_q,
                         "overall": {k: res["overall"][k]
                                     for k in ("recall@5", "ndcg@10",
                                               "mrr", "recall")}})
            print(f"  {tag} vw={vw} -> r@5={res['overall']['recall@5']:.4f} "
                  f"ndcg@10={res['overall']['ndcg@10']:.4f} "
                  f"mrr={res['overall']['mrr']:.4f}")
    elapsed = time.time() - t0

    def sel_score(m):
        return m["recall@5"] + m["ndcg@10"]

    fold_of = stratified_folds(queries, args.n_folds, args.seed)
    folds = []
    oof = {"recall@5": [], "ndcg@10": []}
    for f in range(args.n_folds):
        train_idx = np.flatnonzero(fold_of != f)
        test_idx = np.flatnonzero(fold_of == f)

        def mean_on(run, idx):
            return {k: float(np.mean([run["per_query"][i][k] for i in idx]))
                    for k in ("recall@5", "ndcg@10")}

        best = max(runs, key=lambda x: sel_score(mean_on(x, train_idx)))
        held = mean_on(best, test_idx)
        folds.append({"fold": f, "selected": best["knobs"],
                      "heldout": held, "n_test": int(len(test_idx))})
        for k in oof:
            oof[k].append(held[k])
        print(f"fold {f}: {best['knobs']} -> held-out "
              f"r@5={held['recall@5']:.4f} ndcg@10={held['ndcg@10']:.4f}")

    in_sample = max(runs, key=lambda x: sel_score(x["overall"]))
    out = {
        "metric_protocol": {"n_folds": args.n_folds,
                            "stratified_by": "question type",
                            "selection_metric": "recall@5 + ndcg@10",
                            "seed": args.seed},
        "n_chunks": len(chunks),
        "stack": ckpts,
        "rb": args.rb if args.stack_c else None,
        "profile": args.profile,
        "grid_elapsed_s": round(elapsed, 1),
        "out_of_fold": {
            "recall@5": round(float(np.mean(oof["recall@5"])), 4),
            "ndcg@10": round(float(np.mean(oof["ndcg@10"])), 4),
            "recall@5_std": round(float(np.std(oof["recall@5"])), 4),
            "ndcg@10_std": round(float(np.std(oof["ndcg@10"])), 4),
        },
        "in_sample_best": {"knobs": in_sample["knobs"],
                           "overall": in_sample["overall"]},
        "per_fold": folds,
        "grid": [{"knobs": x["knobs"], "overall": x["overall"]}
                 for x in runs],
        "devices": describe_devices(),
    }
    out_path = Path(args.output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=1))
    print(f"\nout-of-fold: r@5={out['out_of_fold']['recall@5']:.4f} "
          f"ndcg@10={out['out_of_fold']['ndcg@10']:.4f} -> {out_path}")


if __name__ == "__main__":
    main()
