"""Small host-side array helpers."""

from __future__ import annotations

import numpy as np


def topk_desc(scores: np.ndarray, k: int) -> np.ndarray:
    """Deterministic top-k indices: score descending, index ascending on ties.

    The reference uses ``np.argsort(scores)[::-1]`` (bm25_indexer.py:128),
    whose tie order is unstable; batch and single query paths here must agree
    exactly, so ties break canonically by index. Works on 1-D [N] or 2-D
    [B, N] (row-wise); returns [k] or [B, k].
    """
    scores = np.asarray(scores)
    if scores.ndim == 1:
        k = min(k, scores.shape[0])
        idx = np.lexsort((np.arange(scores.shape[0]), -scores))
        return idx[:k]
    k = min(k, scores.shape[1])
    cols = np.broadcast_to(np.arange(scores.shape[1]), scores.shape)
    order = np.lexsort((cols, -scores), axis=1)
    return order[:, :k]
