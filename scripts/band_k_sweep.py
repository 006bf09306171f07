#!/usr/bin/env python
"""Sweep the BM25 dense-band size K at production shape (real corpus).

The fused program scores BM25 as DENSE BAND (top-K df terms via one MXU
matmul) + REST (doc-major gather over the remaining rare terms). Term df
is Zipfian, so raising K moves gather slots onto the MXU at a linear HBM
cost for the [N, K] band matrix read. This measures, on the REAL 91,853-
chunk corpus arrays with the real 200-query term distributions, one full
scoring round per K:

    total_ms(K) = band_matmul_ms + rest_gather_ms

and records slot coverage + rest width so the winning K is explainable.
The shipped default (bm25_band=1024) came from an e2e A/B; this pins the
kernel-level optimum (VERDICT r2 item 8 follow-up).

Usage:
    python scripts/band_k_sweep.py --ks 0,1024,2048,4096,8192
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from domain_rag_system_tpu.utils.jaxtools import (  # noqa: E402
    describe_devices,
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from domain_rag_system_tpu.ops.sparse_bm25 import (  # noqa: E402
    band_scores,
    banded_query_split,
    bm25_scores_split,
    build_dense_band,
    split_overflow,
)


@jax.jit
def _checksum(x):
    return jnp.sum(x)


def timeit(fn, *args, reps=20):
    """Per-call ms fenced by a dependent scalar pull (tunnel-safe)."""
    out = fn(*args)
    float(_checksum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(_checksum(out))
    return (time.perf_counter() - t0) / reps * 1000


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_chunks", type=int, default=91853)
    ap.add_argument("--b", type=int, default=50)
    ap.add_argument("--ks", default="0,1024,2048,4096,8192")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--output", default="results/band_k_sweep.json")
    args = ap.parse_args()

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.etl.synthetic import synthetic_chunks
    from domain_rag_system_tpu.evaluation.runners import load_queries
    from domain_rag_system_tpu.indexing import BM25Index
    from domain_rag_system_tpu.preprocessing import DataLoader, DocumentChunker

    cfg = RetrievalConfig.tuned_at_scale()
    docs = DataLoader(
        pubmed_path=str(ROOT / "data/recovered/BioASQ/corpus_subset.json")
    ).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    chunks = chunks + list(synthetic_chunks(max(args.n_chunks - len(chunks), 0)))
    queries = load_queries(ROOT / "data/recovered/BioASQ/bioasq_queries.json")

    # raw doc-major arrays (band off — we re-band per K below)
    bm25 = BM25Index(k1=cfg.bm25_k1, b=cfg.bm25_b, band_k=0)
    bm25.index_chunks(chunks)
    raw_t = np.asarray(bm25.doc_terms)
    raw_c = np.asarray(bm25.doc_contrib)
    v = len(bm25.vocab)

    # real query term ids, padded to the PRF-expanded width the fused
    # program dispatches (base terms + 15 RM3 expansion terms drawn from
    # the corpus's mid-df range — the realistic case: expansion terms are
    # corpus words, usually non-banded only when rare)
    b = args.b
    enc = [bm25.encode_query(q["body"]) for q in queries[:b]]
    q_ids = np.stack([e[0] for e in enc])
    q_w = np.stack([e[1] for e in enc])
    df = np.bincount(raw_t[raw_t >= 0], minlength=v)
    mid_df = np.argsort(df)[::-1][2000:20000]
    rng = np.random.default_rng(0)
    n_expand = 15
    for row in range(b):
        free = np.nonzero(q_ids[row] < 0)[0][:n_expand]
        q_ids[row, free] = rng.choice(mid_df, len(free)).astype(np.int32)
        q_w[row, free] = 0.3
    q_ids_d, q_w_d = jnp.asarray(q_ids), jnp.asarray(q_w)

    rows = []
    for k in [int(x) for x in args.ks.split(",")]:
        if k == 0:
            base_t, base_c, ovf_r, ovf_t, ovf_c = split_overflow(raw_t, raw_c)
            dev = [jnp.asarray(a) for a in (base_t, base_c, ovf_r, ovf_t, ovf_c)]
            rest_ms = timeit(
                lambda *qa: bm25_scores_split(*dev, *qa, vocab_size=v),
                q_ids_d, q_w_d, reps=args.reps)
            rows.append({"k": 0, "coverage": 0.0,
                         "rest_width": int(base_t.shape[1]),
                         "band_ms": 0.0, "rest_ms": round(rest_ms, 3),
                         "total_ms": round(rest_ms, 3)})
        else:
            band_mat, slot_of, rest_t, rest_c, cov = build_dense_band(
                raw_t, raw_c, v, k)
            base_t, base_c, ovf_r, ovf_t, ovf_c = split_overflow(rest_t, rest_c)
            dev = [jnp.asarray(a) for a in (base_t, base_c, ovf_r, ovf_t, ovf_c)]
            band_dev = jax.device_put(band_mat)
            slot_dev = jax.device_put(slot_of)

            # band arrays ride as ARGUMENTS (closure capture would embed
            # the [N, K] matrix as a compile-request constant — HTTP 413
            # through the remote-compile tunnel at K >= 1024)
            @functools.partial(jax.jit, static_argnames=("kb",))
            def banded_round(band, slot, qi, qw, kb):
                q_dense, qw_rest = banded_query_split(slot, qi, qw, kb)
                return band_scores(band, q_dense), qw_rest

            def full_round(band, slot, qi, qw):
                s_band, qw_rest = banded_round(band, slot, qi, qw, kb=k)
                return s_band + bm25_scores_split(*dev, qi, qw_rest,
                                                  vocab_size=v)

            band_ms = timeit(
                lambda bd, sl, qi, qw: banded_round(bd, sl, qi, qw, kb=k)[0],
                band_dev, slot_dev, q_ids_d, q_w_d, reps=args.reps)
            total_ms = timeit(full_round, band_dev, slot_dev,
                              q_ids_d, q_w_d, reps=args.reps)
            rows.append({"k": k, "coverage": round(cov, 4),
                         "rest_width": int(base_t.shape[1]),
                         "band_ms": round(band_ms, 3),
                         "rest_ms": round(total_ms - band_ms, 3),
                         "total_ms": round(total_ms, 3)})
        print(rows[-1])

    out = {
        "shape": {"n": int(raw_t.shape[0]), "v": v, "b": b,
                  "l": int(q_ids.shape[1]), "raw_width": int(raw_t.shape[1])},
        "rows": rows,
        "best": min(rows, key=lambda r: r["total_ms"]),
        "devices": describe_devices(),
    }
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(out, indent=1))
    print(json.dumps(out["best"]))


if __name__ == "__main__":
    main()
