#!/usr/bin/env python
"""Dense scoring/top-k kernel shootout at production scale.

VERDICT rounds 1/4: measure the fused Pallas score→top-k kernel against
XLA's stock matmul + lax.top_k at [B=50, N=91,853-padded, d], and commit
the result either way.

MEASUREMENT METHODOLOGY (round-5 revision): the remote-TPU transport
memoizes repeated identical executions — timing the same jitted call on
the same inputs in a loop reports microseconds for multi-GFLOP programs
(measured: 8.3 GFLOP matmul "in" 0.026 ms), and ``block_until_ready`` on
this platform returns before execution completes. Honest device time
therefore comes from a ``lax.scan`` of the kernel body INSIDE one jit
(data-dependent carry so iterations can't collapse), synced by a real
``device_get``, differenced between iters=1 and iters=64 to subtract the
~28 ms per-call transport floor. The pre-round-5 artifact (xla 2.6 ms at
d=256) overstated device time ~1.7× for this reason.

Variants:
  * matmul        — dense_scores only (the MXU roofline term)
  * xla           — dense_scores + exact lax.top_k (the shipping path)
  * approx        — dense_scores + lax.approx_max_k (PartialReduce)
  * blockwise     — two-stage exact top-k (per-block then merge)
  * pallas_mask   — Pallas masked-score kernel + exact top-k
  * pallas_fused  — Pallas score→per-tile top-k (no [B, N] materialize);
                    records unavailability if lax.top_k has no Pallas-TPU
                    lowering in this JAX build
  * int8          — int8 corpus rows, dequant fused into the matmul

Usage:
    python scripts/kernel_bench.py [--n 91853] [--b 50] [--d 896] [--k 80]
        [--dtype bfloat16] [--output results/kernel_bench.json]
"""

import argparse
import functools
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
    dense_scores,
    lax_topk,
    pallas_fused_topk,
    pallas_masked_scores,
    quantize_rows_int8,
)


def scan_time_ms(body, example_q, emb, mask, rng, make_q, reps=4):
    """Honest per-iteration device time for ``body(q, emb, mask) -> (v, i)``.

    Runs iters iterations of the body inside ONE jit via lax.scan with a
    data-dependent carry, syncs with device_get, and differences iters=1
    vs iters=64 to remove the per-call transport floor. Fresh random
    queries per rep defeat the transport's identical-execution memoization.
    """
    @functools.partial(jax.jit, static_argnames=("iters",))
    def scan_fn(q0, e, m, iters):
        def step(q, _):
            v, i = body(q, e, m)
            upd = (v.astype(jnp.float32).mean()
                   + i.astype(jnp.float32).mean() * 1e-6)
            return jnp.roll(q, 1, axis=0) + (upd * 1e-6).astype(q.dtype), None
        q0, _ = jax.lax.scan(step, q0, None, length=iters)
        return q0.sum()

    def run(iters):
        ts = []
        for _ in range(reps):
            q0 = make_q()
            float(jax.device_get(q0.sum()))   # q0 resident before timing
            t0 = time.perf_counter()
            float(jax.device_get(scan_fn(q0, emb, mask, iters)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    run(1), run(64)                           # compile both shapes
    t1, t64 = run(1), run(64)
    return (t64 - t1) / 63 * 1e3, t1 * 1e3


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=91853)
    ap.add_argument("--b", type=int, default=50)
    ap.add_argument("--d", type=int, default=896)
    ap.add_argument("--k", type=int, default=80)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--block_n", type=int, default=2048)
    ap.add_argument("--output", default="results/kernel_bench.json")
    args = ap.parse_args()

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    n_pad = -(-args.n // args.block_n) * args.block_n
    rng = np.random.default_rng(0)
    emb_np = rng.standard_normal((n_pad, args.d)).astype(np.float32)
    emb_np /= np.linalg.norm(emb_np, axis=1, keepdims=True)
    emb = jnp.asarray(emb_np).astype(dt)
    mask_np = np.zeros(n_pad, np.uint8)
    mask_np[: args.n] = 1
    mask = jnp.asarray(mask_np)
    q8, scale = quantize_rows_int8(emb_np)
    q8_dev, scale_dev = jnp.asarray(q8), jnp.asarray(scale)

    def make_q():
        q = rng.standard_normal((args.b, args.d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return jnp.asarray(q).astype(dt)

    K = args.k
    results = {}

    def masked(s, m):
        return jnp.where(m.reshape(1, -1) > 0, s, -1e30)

    def v_matmul(q, e, m):
        s = masked(dense_scores(q, e), m)
        # no top-k: reduce to a [B, 8] slice so the scan carry stays cheap
        return s[:, :8], jnp.zeros((q.shape[0], 8), jnp.int32)

    def v_xla(q, e, m):
        return lax_topk(masked(dense_scores(q, e), m), K)

    def v_approx(q, e, m):
        return jax.lax.approx_max_k(masked(dense_scores(q, e), m), K)

    def v_blockwise(q, e, m, bn=4608):
        s = masked(dense_scores(q, e), m)
        nb = s.shape[-1] // bn
        v, i = jax.lax.top_k(s.reshape(s.shape[0], nb, bn), K)
        off = (jnp.arange(nb, dtype=jnp.int32) * bn)[None, :, None]
        gi = (i + off).reshape(s.shape[0], -1)
        sv, sp = jax.lax.top_k(v.reshape(s.shape[0], -1), K)
        return sv, jnp.take_along_axis(gi, sp, axis=1)

    def v_pallas_mask(q, e, m):
        return lax_topk(pallas_masked_scores(q, e, m,
                                             block_n=args.block_n), K)

    def v_int8(q, e, m):
        s = dense_scores(q.astype(jnp.float32), q8_dev.astype(jnp.float32))
        return lax_topk(masked(s * scale_dev.reshape(1, -1), m), K)

    variants = {
        "matmul": v_matmul,
        "xla": v_xla,
        "approx": v_approx,
        "blockwise4608": v_blockwise,
        "pallas_mask": v_pallas_mask,
        "int8": v_int8,
    }
    sync_floor = None
    for name, body in variants.items():
        try:
            per_iter, t1 = scan_time_ms(body, None, emb, mask, rng, make_q)
            results[f"{name}_ms"] = round(per_iter, 4)
            sync_floor = t1 if sync_floor is None else min(sync_floor, t1)
        except Exception as exc:
            results[f"{name}_ms"] = f"unavailable: {exc}"[:200]
    results["sync_floor_ms"] = round(sync_floor, 2) if sync_floor else None

    # exactness checks on one fresh query set
    q = make_q()
    rv, ri = jax.jit(v_xla)(q, emb, mask)
    for name in ("blockwise4608", "pallas_mask", "int8"):
        try:
            bv, bi = jax.jit(variants[name])(q, emb, mask)
            results[f"{name}_exact_idx"] = bool(
                np.array_equal(np.asarray(ri), np.asarray(bi)))
        except Exception:
            pass
    try:
        av, ai = jax.jit(v_approx)(q, emb, mask)
        inter = [len(set(np.asarray(ai)[i].tolist())
                     & set(np.asarray(ri)[i].tolist())) / K
                 for i in range(args.b)]
        results["approx_recall_vs_exact"] = round(float(np.mean(inter)), 4)
    except Exception:
        pass

    def fused(qd):
        return pallas_fused_topk(qd, emb, mask, K, block_n=args.block_n)

    try:
        fs, fi = fused(q)
        results["pallas_fused_matches_xla"] = bool(
            np.array_equal(np.asarray(fi), np.asarray(ri)))
        per_iter, _ = scan_time_ms(lambda q_, e_, m_: fused(q_),
                                   None, emb, mask, rng, make_q)
        results["pallas_fused_ms"] = round(per_iter, 4)
    except Exception as exc:
        results["pallas_fused_ms"] = f"unavailable: {exc}"[:200]

    line = {
        "metric": "dense_topk_kernel_bench",
        "shape": {"B": args.b, "N": args.n, "N_pad": n_pad, "d": args.d,
                  "k": K, "dtype": args.dtype, "block_n": args.block_n},
        "methodology": "lax.scan(iters) inside one jit, device_get sync, "
                       "iters=64 vs 1 differenced (see module docstring — "
                       "the transport memoizes identical executions and "
                       "block_until_ready does not block)",
        "devices": describe_devices(),
        **results,
    }
    print(json.dumps(line, indent=1))
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(line, indent=1))


if __name__ == "__main__":
    main()
