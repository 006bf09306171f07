#!/usr/bin/env python
"""BM25 scoring-layout experiment at production shape (VERDICT r2 item 8).

The fused serving program is BM25-gather-bound at 91k chunks (~24 ms per
scoring round x2 PRF rounds). This measures, at the REAL production shape
[B=50 queries, N=91,853 docs, V=107,808 terms, realistic width skew]:

  * ``bm25_scores``            — batch-major [B, V+1] table (shipping)
  * ``bm25_scores_split``      — + split-overflow row partition (shipping)
  * ``bm25_scores_vocab_major``— [V+1, B] table: the doc-term gather
    becomes an embedding-style axis-0 row gather whose B weights per term
    are contiguous (DMA-friendly) instead of V-strided

plus an HBM speed-of-light estimate, and writes one JSON artifact.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import (  # noqa: E402
    describe_devices,
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from domain_rag_system_tpu.ops.sparse_bm25 import (  # noqa: E402
    bm25_scores,
    bm25_scores_split,
    bm25_scores_vocab_major,
    split_overflow,
)


def synth_corpus(n, v, seed=0):
    """Doc-term arrays with the measured production skew: p50≈30, p99≈40,
    max≈72 unique terms per row; Zipfian term ids."""
    rng = np.random.default_rng(seed)
    widths = np.clip(rng.normal(30, 6, n).astype(int), 4, 40)
    wide = rng.random(n) < 0.005
    widths[wide] = rng.integers(41, 72, wide.sum())
    d = 72
    terms = np.full((n, d), -1, np.int32)
    contrib = np.zeros((n, d), np.float32)
    # Zipf term ids (bounded)
    for i in range(n):
        w = widths[i]
        ids = np.unique((rng.zipf(1.3, w * 2) - 1) % v)[:w].astype(np.int32)
        terms[i, : len(ids)] = ids
        contrib[i, : len(ids)] = rng.random(len(ids)).astype(np.float32) * 3
    return terms, contrib


@jax.jit
def _checksum(x):
    return jnp.sum(x)


def timeit(fn, *args, reps=20):
    """Per-call ms with a FORCED execution sync: through the remote tunnel
    ``block_until_ready`` can return before queued work drains, so each
    pass is fenced by pulling a scalar checksum (tiny transfer) that
    depends on the output."""
    out = fn(*args)
    float(_checksum(out))  # warmup + compile fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(_checksum(out))  # queue drains before the scalar arrives
    return (time.perf_counter() - t0) / reps * 1000, out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=91853)
    ap.add_argument("--v", type=int, default=107808)
    ap.add_argument("--b", type=int, default=50)
    ap.add_argument("--l", type=int, default=47,
                    help="query terms incl. RM3 expansion (32 base + 15)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--output", default="results/bm25_layout_bench.json")
    args = ap.parse_args()

    rng = np.random.default_rng(1)
    terms_np, contrib_np = synth_corpus(args.n, args.v)
    q_ids = rng.integers(0, args.v, (args.b, args.l)).astype(np.int32)
    q_w = np.ones((args.b, args.l), np.float32)

    terms = jnp.asarray(terms_np)
    contrib = jnp.asarray(contrib_np)
    qi = jnp.asarray(q_ids)
    qw = jnp.asarray(q_w)
    sb = [jnp.asarray(a) for a in split_overflow(terms_np, contrib_np)]

    results = {}
    ms, ref = timeit(lambda: bm25_scores(terms, contrib, qi, qw,
                                         vocab_size=args.v), reps=args.reps)
    results["batch_major_full"] = round(ms, 3)

    ms, out = timeit(lambda: bm25_scores_split(*sb, qi, qw,
                                               vocab_size=args.v),
                     reps=args.reps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    results["batch_major_split"] = round(ms, 3)

    ms, out = timeit(lambda: bm25_scores_vocab_major(terms, contrib, qi, qw,
                                                     vocab_size=args.v),
                     reps=args.reps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    results["vocab_major_full"] = round(ms, 3)

    # vocab-major on the split layout (narrow base + tails)
    ms, out = timeit(
        lambda: _split_vm(sb, qi, qw, args.v), reps=args.reps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    results["vocab_major_split"] = round(ms, 3)

    # ---- dense-band hybrid: top-K df terms as an MXU matmul ------------
    # High-df terms dominate the touched slots; giving them a dense
    # [N, K] contribution matrix turns most of the gather work into one
    # [N, K] @ [K, B] matmul and leaves only rare terms (narrow rows) in
    # the gather path.
    for k_band in (512, 1024):
        banded = _build_band(terms_np, contrib_np, args.v, k_band)
        (band_mat, slot_of, rest_terms, rest_contrib, coverage) = banded
        rest_sb = [jnp.asarray(a)
                   for a in split_overflow(rest_terms, rest_contrib)]
        band_dev = jnp.asarray(band_mat)
        slot_dev = jnp.asarray(slot_of)

        ms, out = timeit(lambda: _banded_scores(
            band_dev, slot_dev, rest_sb, qi, qw, args.v, k_band),
            reps=args.reps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)
        results[f"dense_band_{k_band}"] = round(ms, 3)
        results[f"dense_band_{k_band}_slot_coverage"] = round(coverage, 4)
        results[f"dense_band_{k_band}_rest_width"] = int(rest_terms.shape[1])

    # HBM speed-of-light: every touched (term, doc) slot reads B
    # contiguous f32 weights once + terms/contrib arrays once.
    touched = int((terms_np >= 0).sum())
    bytes_moved = touched * (args.b * 4 + 8) + terms_np.nbytes + contrib_np.nbytes
    sol_ms = bytes_moved / 819e9 * 1000  # v5e HBM ~819 GB/s
    results["speed_of_light_ms_est"] = round(sol_ms, 3)

    artifact = {
        "shape": {"n": args.n, "v": args.v, "b": args.b, "l": args.l,
                  "touched_slots": touched},
        "ms_per_call": results,
        "devices": describe_devices(),
    }
    print(json.dumps(artifact, indent=1))
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(artifact, indent=1))


def _build_band(terms_np, contrib_np, v, k_band):
    """Host-side band construction: top-k_band df terms → [N, K] dense
    matrix; each row's remaining terms re-packed into narrower arrays."""
    n, d = terms_np.shape
    df = np.bincount(terms_np[terms_np >= 0], minlength=v)
    band_terms = np.argsort(df)[::-1][:k_band]
    slot_of = np.full(v + 1, -1, np.int32)
    slot_of[band_terms] = np.arange(k_band, dtype=np.int32)

    band_mat = np.zeros((n, k_band), np.float32)
    in_band = (terms_np >= 0) & (slot_of[np.maximum(terms_np, 0)] >= 0)
    rows, cols = np.nonzero(in_band)
    band_mat[rows, slot_of[terms_np[rows, cols]]] = contrib_np[rows, cols]

    touched = int((terms_np >= 0).sum())
    coverage = float(in_band.sum()) / max(touched, 1)

    keep = (terms_np >= 0) & ~in_band
    widths = keep.sum(axis=1)
    new_d = max(8, -(-int(widths.max()) // 8) * 8)
    rest_terms = np.full((n, new_d), -1, np.int32)
    rest_contrib = np.zeros((n, new_d), np.float32)
    for i in range(n):
        sel = np.nonzero(keep[i])[0]
        rest_terms[i, : len(sel)] = terms_np[i, sel]
        rest_contrib[i, : len(sel)] = contrib_np[i, sel]
    return band_mat, slot_of, rest_terms, rest_contrib, coverage


import functools as _ft  # noqa: E402


@_ft.partial(jax.jit, static_argnames=("v", "k_band"))
def _banded_scores_jit(band_mat, slot_of, sb0, sb1, sb2, sb3, sb4,
                       qi, qw, v, k_band):
    b = qi.shape[0]
    slots = slot_of[jnp.clip(qi, 0, v)]                 # [B, L]
    in_band = (qi >= 0) & (slots >= 0)
    # dense band: scatter query weights into [B, K], one MXU matmul
    from domain_rag_system_tpu.ops.sparse_bm25 import band_scores

    rowsb = jnp.broadcast_to(jnp.arange(b)[:, None], qi.shape)
    q_dense = jnp.zeros((b, k_band), jnp.float32).at[
        rowsb, jnp.maximum(slots, 0)].add(jnp.where(in_band, qw, 0.0))
    dense_part = band_scores(band_mat, q_dense)          # [B, N]
    # sparse rest: banded query terms zeroed out
    qw_rest = jnp.where(in_band, 0.0, qw)
    rest = bm25_scores_split(sb0, sb1, sb2, sb3, sb4, qi, qw_rest,
                             vocab_size=v)
    return dense_part + rest


def _banded_scores(band_dev, slot_dev, rest_sb, qi, qw, v, k_band):
    return _banded_scores_jit(band_dev, slot_dev, *rest_sb, qi, qw,
                              v, k_band)


def _split_vm(sb, qi, qw, v):
    base_terms, base_contrib, ovf_rows, ovf_terms, ovf_contrib = sb
    s = bm25_scores_vocab_major(base_terms, base_contrib, qi, qw,
                                vocab_size=v)
    if ovf_terms.shape[0]:
        ovf = bm25_scores_vocab_major(ovf_terms, ovf_contrib, qi, qw,
                                      vocab_size=v)
        s = s.at[:, ovf_rows].add(ovf)
    return s


if __name__ == "__main__":
    main()
