"""Multi-host corpus sharding: REAL 2-process jax.distributed run (Gloo).

Spawns two fresh interpreters, each owning 4 virtual CPU devices; together
they form one 8-device global mesh. Each process loads only ITS contiguous
slab of the corpus matrix (no host materializes the full corpus), the
global row-sharded array is assembled with
``jax.make_array_from_process_local_data``, and the unchanged
``sharded_cosine_topk`` program must return exactly the single-process
oracle's top-k. This is the DCN story of SURVEY.md §2.6 exercised end to
end, not just unit-tested helpers.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, {root!r})
    # jax.distributed.initialize must run before anything touches the XLA
    # backend — so before importing the package (whose import builds jit
    # wrappers and queries devices).
    import jax
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address="localhost:{port}",
                               num_processes=2, process_id=pid)
    from domain_rag_system_tpu.parallel.multihost import (
        init_multihost, process_slice, global_sharded_rows,
        global_replicated)
    # idempotence: calling the wrapper on an already-initialized runtime
    # must be a harmless no-op reporting the real topology
    assert init_multihost(coordinator_address="localhost:{port}",
                          num_processes=2, process_id=pid) == (pid, 2)
    assert jax.process_count() == 2
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from domain_rag_system_tpu.parallel import sharded_cosine_topk
    from domain_rag_system_tpu.parallel.mesh import SHARD_AXIS

    # deterministic corpus, same on both processes (stands in for a
    # shared corpus store each host reads its slice from)
    rng = np.random.RandomState(0)
    n, d, b, k = 60, 16, 3, 5
    corpus = rng.randn(n, d).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.randn(b, d).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    start, stop, total = process_slice(n, 2, pid)
    slab = np.zeros((stop - start, d), np.float32)
    real = corpus[start:min(stop, n)]
    slab[: len(real)] = real                      # tail rows stay zero
    mask_slab = np.zeros(stop - start, np.float32)
    mask_slab[: len(real)] = 1.0

    mesh = Mesh(np.array(jax.devices()), (SHARD_AXIS,))
    emb = global_sharded_rows(slab, mesh)
    mask = global_sharded_rows(mask_slab, mesh)
    q = global_replicated(queries, mesh)
    assert emb.shape == (total, d)

    scores, idx = sharded_cosine_topk(q, emb, mask, k, mesh)

    # sparse arm: same slab machinery over the BM25 doc-major arrays
    from domain_rag_system_tpu.ops.sparse_bm25 import build_okapi_arrays
    from domain_rag_system_tpu.parallel import sharded_bm25_topk
    vocab = 50
    tok_corpus = [list(rng2) for rng2 in
                  np.random.RandomState(1).randint(0, vocab, size=(n, 7))]
    doc_terms, doc_contrib, idf, stats = build_okapi_arrays(tok_corpus, vocab)
    dslab = np.full((stop - start, doc_terms.shape[1]), -1, np.int32)
    cslab = np.zeros((stop - start, doc_terms.shape[1]), np.float32)
    dslab[: len(real)] = doc_terms[start:min(stop, n)]
    cslab[: len(real)] = doc_contrib[start:min(stop, n)]
    g_terms = global_sharded_rows(dslab, mesh)
    g_contrib = global_sharded_rows(cslab, mesh)
    q_ids = np.array([[1, 4, 9, -1]] * b, np.int32)
    q_w = np.ones((b, 4), np.float32)
    s_scores, s_idx = sharded_bm25_topk(
        g_terms, g_contrib,
        global_replicated(q_ids, mesh), global_replicated(q_w, mesh),
        k, mesh, vocab_size=vocab)

    # ---- the FULL fused hybrid program under DCN (VERDICT r4 item 5) ----
    # banded BM25 (dense band matmul + rest gather) + RM3 PRF + weighted
    # fusion with the dense arm, run as the production _fused_batch_
    # retrieval jit over globally-sharded arrays: XLA's SPMD partitioner
    # inserts the cross-process collectives (the 2-process test previously
    # covered only the per-op shard_map helpers).
    from domain_rag_system_tpu.ops.sparse_bm25 import build_dense_band
    from domain_rag_system_tpu.pipeline import _fused_batch_retrieval

    band_mat_np, slot_of, _, _, _ = build_dense_band(
        doc_terms, doc_contrib, vocab, 16)
    bslab = np.zeros((stop - start, band_mat_np.shape[1]), np.float32)
    bslab[: len(real)] = band_mat_np[start:min(stop, n)]
    g_band = global_sharded_rows(bslab, mesh)
    svalid_slab = np.zeros(stop - start, np.uint8)
    svalid_slab[: len(real)] = 1
    g_svalid = global_sharded_rows(svalid_slab, mesh)
    rep = lambda x: global_replicated(np.asarray(x), mesh)
    placeholder_u8 = rep(np.ones((1, 1), np.uint8))
    sb = (rep(np.full((1, 1), -1, np.int32)),
          rep(np.zeros((1, 1), np.float32)),
          rep(np.zeros(0, np.int32)),
          rep(np.full((0, 8), -1, np.int32)),
          rep(np.zeros((0, 8), np.float32)))
    fused_ids, fused_scores, _ = _fused_batch_retrieval(
        emb, mask.astype(jnp.uint8), g_terms, g_contrib, *sb,
        g_svalid,
        q, rep(q_ids), rep(q_w), q,
        rep(np.zeros((), np.float32)),
        0.4, 0.6,
        placeholder_u8, placeholder_u8,
        placeholder_u8, placeholder_u8,
        rep(np.zeros((), np.float32)), rep(np.zeros((), np.float32)),
        None, None, g_band, rep(slot_of),
        None, rep(np.zeros((), np.float32)), None, None,
        over_k=2 * k, fetch_k=k, fusion_method="weighted",
        rerank_top_n=0, vocab_size=vocab, has_dense=True, has_sparse=True,
        use_rerank=False, use_split=False, prf_terms=3, prf_docs=4,
        prf_alpha=0.6, has_qfilter=False, has_qboost=False, band_k=16)

    # fully-addressable result? top-k output is replicated — each process
    # reads its addressable copy
    out = {{
        "idx": np.asarray(jax.device_get(
            idx.addressable_data(0))).tolist(),
        "scores": np.asarray(jax.device_get(
            scores.addressable_data(0))).astype(float).tolist(),
        "bm25_idx": np.asarray(jax.device_get(
            s_idx.addressable_data(0))).tolist(),
        "bm25_scores": np.asarray(jax.device_get(
            s_scores.addressable_data(0))).astype(float).tolist(),
        "hybrid_ids": np.asarray(jax.device_get(
            fused_ids.addressable_data(0))).tolist(),
        "hybrid_scores": np.asarray(jax.device_get(
            fused_scores.addressable_data(0))).astype(float).tolist(),
    }}
    if pid == 0:
        print("RESULT " + json.dumps(out), flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_topk_matches_oracle(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(root=str(ROOT), port=port))

    env = dict(os.environ)
    env["DRS_TPU_TEST_REEXEC"] = "1"            # don't re-exec in workers
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    line = next(ln for ln in outs[0].splitlines() if ln.startswith("RESULT "))
    result = json.loads(line[len("RESULT "):])

    # single-process oracle
    rng = np.random.RandomState(0)
    n, d, b, k = 60, 16, 3, 5
    corpus = rng.randn(n, d).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.randn(b, d).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    scores = queries @ corpus.T
    expect_idx = np.argsort(-scores, axis=1)[:, :k]

    got_idx = np.asarray(result["idx"])
    got_scores = np.asarray(result["scores"])
    expect_scores = np.take_along_axis(scores, expect_idx, axis=1)
    np.testing.assert_allclose(got_scores, expect_scores, atol=1e-5)
    # indices may permute among score ties; compare score-sorted sets
    for row_got, row_exp in zip(got_idx, expect_idx):
        assert set(row_got) == set(row_exp)

    # BM25 arm: distributed scores must equal the single-process oracle
    from domain_rag_system_tpu.ops.sparse_bm25 import (
        bm25_scores,
        build_okapi_arrays,
    )

    vocab = 50
    tok_corpus = [list(r) for r in
                  np.random.RandomState(1).randint(0, vocab, size=(n, 7))]
    doc_terms, doc_contrib, _, _ = build_okapi_arrays(tok_corpus, vocab)
    q_ids = np.array([[1, 4, 9, -1]] * b, np.int32)
    q_w = np.ones((b, 4), np.float32)
    full = np.asarray(bm25_scores(doc_terms, doc_contrib, q_ids, q_w,
                                  vocab_size=vocab))
    expect_bm = -np.sort(-full, axis=1)[:, :k]
    got_bm = np.asarray(result["bm25_scores"])
    assert (expect_bm[:, 0] > 0).all()  # top hits are real, not padding
    np.testing.assert_allclose(got_bm, expect_bm, atol=1e-5)

    # hybrid arm: the fused banded+PRF+fusion program under DCN must equal
    # the same program run single-process on the unsharded arrays
    import jax.numpy as jnp

    from domain_rag_system_tpu.ops.sparse_bm25 import build_dense_band
    from domain_rag_system_tpu.pipeline import (
        _SB_PLACEHOLDER,
        _fused_batch_retrieval,
    )

    band_mat_np, slot_of, _, _, _ = build_dense_band(
        doc_terms, doc_contrib, vocab, 16)
    zero = jnp.zeros((), jnp.float32)
    exp_ids, exp_scores, _ = _fused_batch_retrieval(
        jnp.asarray(corpus), jnp.ones(n, jnp.uint8),
        jnp.asarray(doc_terms), jnp.asarray(doc_contrib),
        *_SB_PLACEHOLDER(),
        jnp.ones(n, jnp.uint8),
        jnp.asarray(queries), jnp.asarray(q_ids), jnp.asarray(q_w),
        jnp.asarray(queries), zero,
        0.4, 0.6,
        jnp.ones((1, 1), jnp.uint8), jnp.ones((1, 1), jnp.uint8),
        jnp.ones((1, 1), jnp.uint8), jnp.ones((1, 1), jnp.uint8),
        zero, zero,
        None, None, jnp.asarray(band_mat_np), jnp.asarray(slot_of),
        None, zero, None, None,
        over_k=2 * k, fetch_k=k, fusion_method="weighted",
        rerank_top_n=0, vocab_size=vocab, has_dense=True, has_sparse=True,
        use_rerank=False, use_split=False, prf_terms=3, prf_docs=4,
        prf_alpha=0.6, has_qfilter=False, has_qboost=False, band_k=16)
    got_h_ids = np.asarray(result["hybrid_ids"])
    got_h_scores = np.asarray(result["hybrid_scores"])
    np.testing.assert_array_equal(got_h_ids, np.asarray(exp_ids))
    np.testing.assert_allclose(got_h_scores, np.asarray(exp_scores),
                               atol=1e-5)


def test_process_slice_partitioning():
    from domain_rag_system_tpu.parallel.multihost import (
        padded_rows_total,
        process_slice,
    )

    total = padded_rows_total(60, 2, block=8)
    assert total % (2 * 8) == 0 and total >= 60
    s0 = process_slice(60, 2, 0)
    s1 = process_slice(60, 2, 1)
    assert s0 == (0, total // 2, total)
    assert s1 == (total // 2, total, total)
