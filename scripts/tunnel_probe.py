#!/usr/bin/env python
"""Characterize per-operation host↔device costs through the remote-TPU
tunnel: eager array creation, host→device upload, jit dispatch, and
device→host pull. These fixed costs set the serving floor — at batch 50
the fused program's FLOPs are cheap, so every avoidable round trip is a
visible slice of queries/sec.

Prints one JSON line with median milliseconds per operation.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def med_ms(fn, n=30, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1000)
    ts.sort()
    return round(ts[len(ts) // 2], 3)


def main() -> None:
    dev = jax.devices()[0]
    out = {"device": str(dev)}

    tok = np.zeros((50, 64), np.int32)
    packed = np.zeros((50, 2, 40), np.int32)
    blob = np.concatenate([tok.ravel(), packed.ravel(),
                           np.zeros(3, np.int32)])

    # eager creation ops (run per dispatch in the current hot path)
    out["eager_zeros_50x1"] = med_ms(
        lambda: jnp.zeros((50, 1), jnp.float32).block_until_ready())
    out["eager_ones_1x1"] = med_ms(
        lambda: jnp.ones((1, 1), jnp.uint8).block_until_ready())
    out["eager_scalar_f32"] = med_ms(
        lambda: jnp.float32(0.5).block_until_ready())

    # host→device uploads
    out["upload_tok_50x64"] = med_ms(
        lambda: jnp.asarray(tok).block_until_ready())
    out["upload_packed_50x2x40"] = med_ms(
        lambda: jnp.asarray(packed).block_until_ready())
    out["upload_blob_combined"] = med_ms(
        lambda: jnp.asarray(blob).block_until_ready())

    # two separate uploads vs one combined (the dispatch_batch question)
    def two():
        a = jnp.asarray(tok)
        b = jnp.asarray(packed)
        a.block_until_ready(); b.block_until_ready()
    out["upload_two_separate"] = med_ms(two)

    # jit dispatch with device-resident args vs numpy args
    big = jax.device_put(np.random.rand(4096, 256).astype(np.float32))

    @jax.jit
    def prog(m, t, p, w):
        s = m @ m[:50].T
        return (s.sum() + t.sum() + p.sum() + w).astype(jnp.float32)

    tok_d = jax.device_put(tok)
    packed_d = jax.device_put(packed)
    prog(big, tok_d, packed_d, 0.5).block_until_ready()
    out["jit_device_args"] = med_ms(
        lambda: prog(big, tok_d, packed_d, 0.5).block_until_ready())
    out["jit_numpy_args"] = med_ms(
        lambda: prog(big, tok, packed, 0.5).block_until_ready())

    # device→host pulls
    small = jax.device_put(np.zeros((50, 120), np.float32))
    out["pull_50x120_f32"] = med_ms(lambda: np.asarray(small))
    trio = [jax.device_put(np.zeros((50, 120), np.float32))
            for _ in range(3)]
    out["pull_three_device_get"] = med_ms(lambda: jax.device_get(tuple(trio)))

    # copy_to_host_async support on this backend
    arr = jax.device_put(np.zeros((50, 120), np.float32))
    try:
        arr.copy_to_host_async()
        out["copy_to_host_async"] = "ok"
    except Exception as e:  # noqa: BLE001
        out["copy_to_host_async"] = f"unsupported: {type(e).__name__}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
