"""Fusion-op correctness vs Python oracles implementing the reference's
fusion semantics (hybrid_indexer.py:112-218)."""

import numpy as np
import jax.numpy as jnp

from domain_rag_system_tpu.ops.fusion import rrf_fuse_device, weighted_fuse_device


def rrf_oracle(ids_a, ids_b, top_k, k=60):
    scores = {}
    for rank, cid in enumerate(ids_a, 1):
        if cid >= 0:
            scores[cid] = scores.get(cid, 0.0) + 1.0 / (k + rank)
    for rank, cid in enumerate(ids_b, 1):
        if cid >= 0:
            scores[cid] = scores.get(cid, 0.0) + 1.0 / (k + rank)
    ranked = sorted(scores.items(), key=lambda kv: -kv[1])
    return ranked[:top_k]


def test_rrf_matches_oracle():
    ids_a = np.array([5, 3, 9, 1, -1, -1], dtype=np.int32)
    ids_b = np.array([3, 7, 5, 2, 8, -1], dtype=np.int32)
    fused_ids, fused_scores = rrf_fuse_device(jnp.asarray(ids_a), jnp.asarray(ids_b), 5)
    expected = rrf_oracle(ids_a, ids_b, 5)
    got = [(int(i), float(s)) for i, s in zip(fused_ids, fused_scores) if i >= 0]
    assert [g[0] for g in got] == [e[0] for e in expected]
    np.testing.assert_allclose([g[1] for g in got], [e[1] for e in expected], rtol=1e-6)


def test_rrf_overlap_ranks_first():
    # id 4 appears at rank 2 in both lists -> 2/(60+2) beats any single-list hit
    ids_a = np.array([1, 4, 2], dtype=np.int32)
    ids_b = np.array([3, 4, 5], dtype=np.int32)
    fused_ids, _ = rrf_fuse_device(jnp.asarray(ids_a), jnp.asarray(ids_b), 3)
    assert int(fused_ids[0]) == 4


def test_rrf_all_padding():
    pads = jnp.full(4, -1, dtype=jnp.int32)
    fused_ids, _ = rrf_fuse_device(pads, pads, 3)
    assert (np.asarray(fused_ids) == -1).all()


def weighted_oracle(ids_a, scores_a, ids_b, scores_b, top_k, wa=0.5, wb=0.5):
    def norm(ids, scores):
        valid = [(i, s) for i, s in zip(ids, scores) if i >= 0]
        if not valid:
            return {}
        vals = [s for _, s in valid]
        lo, hi = min(vals), max(vals)
        if hi == lo:
            return {i: s for i, s in valid}  # reference fallback: raw scores
        return {i: (s - lo) / (hi - lo) for i, s in valid}

    na, nb = norm(ids_a, scores_a), norm(ids_b, scores_b)
    combined = {}
    for i, s in na.items():
        combined[i] = combined.get(i, 0.0) + wa * s
    for i, s in nb.items():
        combined[i] = combined.get(i, 0.0) + wb * s
    return sorted(combined.items(), key=lambda kv: -kv[1])[:top_k]


def test_weighted_matches_oracle():
    ids_a = np.array([5, 3, 9, -1], dtype=np.int32)
    sc_a = np.array([0.9, 0.7, 0.2, 0.0], dtype=np.float32)
    ids_b = np.array([3, 7, 5], dtype=np.int32)
    sc_b = np.array([12.0, 8.0, 3.0], dtype=np.float32)
    fused_ids, fused_scores = weighted_fuse_device(
        jnp.asarray(ids_a), jnp.asarray(sc_a),
        jnp.asarray(ids_b), jnp.asarray(sc_b), 4,
        weight_a=0.6, weight_b=0.4,
    )
    expected = weighted_oracle(ids_a, sc_a, ids_b, sc_b, 4, 0.6, 0.4)
    got = [(int(i), float(s)) for i, s in zip(fused_ids, fused_scores) if i >= 0]
    assert [g[0] for g in got] == [e[0] for e in expected]
    np.testing.assert_allclose([g[1] for g in got], [e[1] for e in expected],
                               rtol=1e-5, atol=1e-6)


def test_weighted_equal_scores_fallback():
    # all scores equal in list b -> reference keeps raw scores
    ids_a = np.array([1, 2], dtype=np.int32)
    sc_a = np.array([0.5, 0.1], dtype=np.float32)
    ids_b = np.array([2, 3], dtype=np.int32)
    sc_b = np.array([2.0, 2.0], dtype=np.float32)
    fused_ids, fused_scores = weighted_fuse_device(
        jnp.asarray(ids_a), jnp.asarray(sc_a),
        jnp.asarray(ids_b), jnp.asarray(sc_b), 3,
    )
    expected = weighted_oracle(ids_a, sc_a, ids_b, sc_b, 3)
    got = [(int(i), float(s)) for i, s in zip(fused_ids, fused_scores) if i >= 0]
    assert [g[0] for g in got] == [e[0] for e in expected]


def test_batch_fusion_wrappers_match_single():
    from domain_rag_system_tpu.ops.fusion import rrf_fuse_batch, weighted_fuse_batch

    ids_a = np.array([[5, 3, 9, -1], [1, 2, 3, 4]], dtype=np.int32)
    ids_b = np.array([[3, 7, 5, 2], [4, 5, -1, -1]], dtype=np.int32)
    sc_a = np.array([[0.9, 0.7, 0.2, 0.0], [0.5, 0.4, 0.3, 0.2]], np.float32)
    sc_b = np.array([[12.0, 8.0, 3.0, 1.0], [2.0, 1.0, 0.0, 0.0]], np.float32)

    b_ids, b_scores = rrf_fuse_batch(jnp.asarray(ids_a), jnp.asarray(ids_b), 4)
    for row in range(2):
        s_ids, s_scores = rrf_fuse_device(jnp.asarray(ids_a[row]),
                                          jnp.asarray(ids_b[row]), 4)
        np.testing.assert_array_equal(np.asarray(b_ids[row]), np.asarray(s_ids))
        np.testing.assert_allclose(np.asarray(b_scores[row]),
                                   np.asarray(s_scores), rtol=1e-6)

    wb_ids, _ = weighted_fuse_batch(
        jnp.asarray(ids_a), jnp.asarray(sc_a),
        jnp.asarray(ids_b), jnp.asarray(sc_b), 4, 0.6, 0.4)
    for row in range(2):
        ws_ids, _ = weighted_fuse_device(
            jnp.asarray(ids_a[row]), jnp.asarray(sc_a[row]),
            jnp.asarray(ids_b[row]), jnp.asarray(sc_b[row]), 4, 0.6, 0.4)
        np.testing.assert_array_equal(np.asarray(wb_ids[row]), np.asarray(ws_ids))
