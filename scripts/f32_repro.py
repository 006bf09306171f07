#!/usr/bin/env python
"""Minimal repro for the f32 fused-program slowdown (VERDICT r2 weak 8).

Observed in round 2: with FLOAT32 corpus rows the whole fused serving
program runs ~3.4x slower than bf16 — even at vector_weight=0, where the
dense scores cannot affect the output ranking. This strips the effect to
its minimal form: ONE program containing (a) a [B, d] @ [N, d]^T cosine
matmul and (b) an unrelated BM25-style gather+einsum, measured with the
matmul input in f32 vs bf16 at production shapes.

If the effect reproduces here, the diagnosis is scheduling/fusion-level
(the f32 matmul's larger HBM traffic serializes with the gather); if it
does not, the pathology needs the full program's structure and an HLO
dump (jax.jit(...).lower(...).compile().as_text()) is captured for the
differing case.
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


@jax.jit
def _checksum(*xs):
    return sum(jnp.sum(x) for x in xs)


def fused(emb, q, terms, contrib, table):
    scores_d = jax.lax.dot_general(
        q.astype(emb.dtype), emb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [B, N]
    gathered = table[:, terms]                       # [B, Nb, D]
    scores_s = jnp.einsum("bnd,nd->bn", gathered, contrib)
    k = 100
    sd, _ = jax.lax.top_k(scores_d, k)
    ss, _ = jax.lax.top_k(scores_s, k)
    return sd, ss


def run(dtype, n, d, b, width, v, reps, dump_hlo=False):
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32)).astype(dtype)
    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    terms = jnp.asarray(rng.integers(0, v, (n, width)).astype(np.int32))
    contrib = jnp.asarray(rng.random((n, width)).astype(np.float32))
    table = jnp.asarray(rng.random((b, v + 1)).astype(np.float32))

    fn = jax.jit(fused)
    out = fn(emb, q, terms, contrib, table)
    float(_checksum(*out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(emb, q, terms, contrib, table)
    float(_checksum(*out))
    ms = (time.perf_counter() - t0) / reps * 1000
    hlo = None
    if dump_hlo:
        hlo = fn.lower(emb, q, terms, contrib, table).compile().as_text()
    return ms, hlo


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=92160)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--b", type=int, default=50)
    ap.add_argument("--width", type=int, default=40)
    ap.add_argument("--v", type=int, default=107808)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--dump_hlo_dir", default=None)
    ap.add_argument("--output", default="results/f32_repro.json")
    args = ap.parse_args()

    out = {"shape": vars(args), "devices": describe_devices()}
    for name, dtype in (("bfloat16", jnp.bfloat16), ("float32", jnp.float32)):
        ms, hlo = run(dtype, args.n, args.d, args.b, args.width, args.v,
                      args.reps, dump_hlo=bool(args.dump_hlo_dir))
        out[name + "_ms"] = round(ms, 3)
        if hlo and args.dump_hlo_dir:
            p = Path(args.dump_hlo_dir) / f"fused_{name}.hlo.txt"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(hlo)
            out[name + "_hlo"] = str(p)
    out["f32_over_bf16"] = round(out["float32_ms"] / out["bfloat16_ms"], 2)
    print(json.dumps(out, indent=1))
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
