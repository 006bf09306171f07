#!/usr/bin/env python
"""Dense scoring/top-k kernel shootout at production scale.

VERDICT.md round-1 item 6: measure the fused Pallas score→top-k kernel
against XLA's stock matmul + lax.top_k at [B=50, N=91,853-padded, d] in
f32 AND int8, and commit the result either way.

Variants:
  * xla        — dense_scores (MXU matmul) + lax.top_k over [B, N]
  * pallas     — Pallas masked-score kernel (mask fused into the score
                 write) + lax.top_k
  * fused      — Pallas score→per-tile top-k (the [B, N] score matrix
                 never reaches HBM) + global top-k over tile survivors
  * int8       — int8 corpus rows, dequant fused into the matmul epilogue

Usage:
    python scripts/kernel_bench.py [--n 91853] [--b 50] [--d 256] [--k 80]
        [--output results/kernel_bench.json]
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

from domain_rag_system_tpu.ops.dense_topk import (  # noqa: E402
    cosine_topk,
    pallas_fused_topk,
    pallas_masked_scores,
    lax_topk,
    quantize_rows_int8,
)


def timeit(fn, *args, iters: int = 20, warmup: int = 3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=91853)
    ap.add_argument("--b", type=int, default=50)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--k", type=int, default=80)
    ap.add_argument("--block_n", type=int, default=2048)
    ap.add_argument("--output", default="results/kernel_bench.json")
    args = ap.parse_args()

    n_pad = -(-args.n // args.block_n) * args.block_n
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n_pad, args.d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((args.b, args.d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    mask = np.zeros(n_pad, np.uint8)
    mask[: args.n] = 1

    emb_dev = jnp.asarray(emb)
    q_dev = jnp.asarray(q)
    mask_dev = jnp.asarray(mask)
    q8, scale = quantize_rows_int8(emb)
    q8_dev, scale_dev = jnp.asarray(q8), jnp.asarray(scale)

    results = {}

    def xla(qd, ed, md):
        return cosine_topk(qd, ed, args.k, mask=md)

    results["xla_f32_ms"] = timeit(xla, q_dev, emb_dev, mask_dev) * 1e3

    def pallas_mask(qd, ed, md):
        return lax_topk(pallas_masked_scores(qd, ed, md,
                                             block_n=args.block_n), args.k)

    try:
        results["pallas_mask_f32_ms"] = timeit(
            pallas_mask, q_dev, emb_dev, mask_dev) * 1e3
    except Exception as exc:
        results["pallas_mask_f32_ms"] = f"unavailable: {exc}"[:200]

    def fused(qd, ed, md):
        return pallas_fused_topk(qd, ed, md, args.k, block_n=args.block_n)

    try:
        # correctness check before timing
        fs, fi = fused(q_dev, emb_dev, mask_dev)
        rs, ri = xla(q_dev, emb_dev, mask_dev)
        np.testing.assert_allclose(np.asarray(fs), np.asarray(rs),
                                   rtol=1e-5, atol=1e-5)
        results["fused_matches_xla"] = bool(
            np.array_equal(np.asarray(fi), np.asarray(ri)))
        results["pallas_fused_f32_ms"] = timeit(
            fused, q_dev, emb_dev, mask_dev) * 1e3
    except Exception as exc:
        results["pallas_fused_f32_ms"] = f"unavailable: {exc}"[:200]

    def int8_path(qd, ed, md, sd):
        return cosine_topk(qd, ed, args.k, mask=md, row_scale=sd)

    results["xla_int8_ms"] = timeit(
        int8_path, q_dev, q8_dev, mask_dev, scale_dev) * 1e3

    line = {
        "metric": "dense_topk_kernel_bench",
        "shape": {"B": args.b, "N": args.n, "N_pad": n_pad, "d": args.d,
                  "k": args.k, "block_n": args.block_n},
        "devices": describe_devices(),
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in results.items()},
    }
    print(json.dumps(line, indent=1))
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(line, indent=1))


if __name__ == "__main__":
    main()
