"""Hybrid dense + BM25 retrieval with on-device fusion.

Orchestration parity with the reference ``HybridIndexer``
(``src/indexing/hybrid_indexer.py:10-246``): index both sub-indexes, fetch
``top_k × 2`` candidates from each (``:83,90``), fuse by RRF (k=60) or
min-max weighted sum, tag results with ``fusion_method``.

Unlike the reference — which fuses Python dicts on the host — fusion here is
the jitted device ops of :mod:`domain_rag_system_tpu.ops.fusion` operating on
global chunk indices; the host only materializes the final top-k result
dicts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from domain_rag_system_tpu.indexing.bm25_index import BM25Index
from domain_rag_system_tpu.indexing.dense_index import DenseIndex
from domain_rag_system_tpu.ops.fusion import rrf_fuse_device, weighted_fuse_device
from domain_rag_system_tpu.preprocessing.documents import Chunk
from domain_rag_system_tpu.utils import get_logger, topk_desc

log = get_logger(__name__)


class HybridIndex:
    """Dense + sparse retrieval with device-side rank fusion."""

    def __init__(
        self,
        dense_index: Optional[DenseIndex] = None,
        bm25_index: Optional[BM25Index] = None,
    ):
        self.dense_index = dense_index
        self.bm25_index = bm25_index
        self.chunks: List[Chunk] = []
        self._doc_group_dev = None  # lazy [N_rows] row→doc-code device map

    # ------------------------------------------------------------------ build

    def index_chunks(self, chunks: Sequence[Chunk],
                     precomputed_embeddings=None) -> None:
        self.chunks = list(chunks)
        if self.dense_index is not None:
            self.dense_index.index_chunks(
                self.chunks, precomputed=precomputed_embeddings)
        else:
            log.warning("no dense index configured")
        if self.bm25_index is not None:
            self.bm25_index.index_chunks(self.chunks)
        else:
            log.warning("no BM25 index configured")
        self._doc_group_dev = None
        log.info("hybrid index built over %d chunks", len(self.chunks))

    def doc_group_rows(self) -> jnp.ndarray:
        """[N_rows] int32 DEVICE map: global chunk row → integer doc code
        (-1 for rows past the live chunk list, e.g. mesh padding). Cached;
        invalidated by every chunk-set mutation. The fused batch program
        uses it for device-side doc grouping — the host previously walked
        ``batch × fetch_k`` Python dict lookups per batch to group chunks
        into documents."""
        if self._doc_group_dev is None:
            n_rows = len(self.chunks)
            for sub in (self.dense_index, self.bm25_index):
                arr = getattr(sub, "embeddings", None)
                if arr is None:
                    arr = getattr(sub, "doc_terms", None)
                if arr is not None:
                    n_rows = max(n_rows, int(arr.shape[0]))
            codes = np.full(n_rows, -1, dtype=np.int32)
            doc_code: Dict[str, int] = {}
            for i, chunk in enumerate(self.chunks):
                codes[i] = doc_code.setdefault(chunk.doc_id, len(doc_code))
            self._doc_group_dev = jnp.asarray(codes)
        return self._doc_group_dev

    def add_chunks_incremental(self, chunks: Sequence[Chunk]) -> None:
        """Upsert chunks into both live sub-indexes (no full rebuild).

        Qdrant-upsert semantics (reference ``vector_indexer.py:105-163``):
        an incoming chunk whose id already exists REPLACES the old version
        — the old row is tombstoned so at most one live row per id. Within
        one batch the last occurrence of an id wins."""
        by_id = {c.chunk_id: c for c in chunks}      # last occurrence wins
        chunks = list(by_id.values())
        existing = {c.chunk_id for c in self.chunks}
        stale = [cid for cid in by_id if cid in existing]
        if stale:
            if self.dense_index is not None:
                self.dense_index.delete_chunks(stale)
            if self.bm25_index is not None:
                # defer the BM25 rebuild — add_chunks below rebuilds anyway
                # (one ~1 s rebuild per upsert instead of two at 91k)
                self.bm25_index.delete_chunks(stale, rebuild=False)
        self.chunks.extend(chunks)
        if self.dense_index is not None:
            self.dense_index.add_chunks(chunks)
        if self.bm25_index is not None:
            self.bm25_index.add_chunks(chunks)
        self._doc_group_dev = None

    def delete_chunks(self, chunk_ids: Sequence[str]) -> int:
        """Tombstone chunks in both sub-indexes; returns count removed."""
        deleted = 0
        if self.dense_index is not None:
            deleted = self.dense_index.delete_chunks(chunk_ids)
        if self.bm25_index is not None:
            deleted = max(deleted, self.bm25_index.delete_chunks(chunk_ids))
        return deleted

    # ------------------------------------------------------------------ query

    def _dense_candidates(self, query: str, k: int, filters) -> tuple:
        scores, idx = self.dense_index.search_batch([query], top_k=k, filters=filters)
        return idx[0].astype(np.int32), scores[0].astype(np.float32)

    def _sparse_candidates(self, query: str, k: int, filters) -> tuple:
        scores = self.bm25_index.scores(query)
        mask = self.bm25_index._filters.mask(filters)
        if mask is not None:
            scores = np.where(mask > 0, scores, -np.inf)
        alive = self.bm25_index.alive_mask()
        if alive is not None:
            # tombstoned rows score exactly 0 and would otherwise stay ranked
            scores = np.where(alive[: len(scores)], scores, -np.inf)
        top = topk_desc(scores, k).astype(np.int32)
        top_scores = scores[top].astype(np.float32)
        # Zero-score docs stay in the ranked list (reference argsort keeps
        # them, bm25_indexer.py:128 — they carry RRF mass); only filtered-out
        # (-inf) slots are invalidated.
        valid = np.isfinite(top_scores)
        return np.where(valid, top, -1), np.where(valid, top_scores, 0.0)

    def search(
        self,
        query: str,
        top_k: int = 10,
        vector_weight: float = 0.5,
        bm25_weight: float = 0.5,
        filters: Optional[Dict] = None,
        fusion_method: str = "rrf",
    ) -> List[Dict]:
        fetch_k = top_k * 2  # reference over-fetch multiplier (:83,90)

        have_dense = self.dense_index is not None and self.dense_index.embeddings is not None
        have_sparse = self.bm25_index is not None and self.bm25_index.doc_terms is not None
        if not have_dense and not have_sparse:
            raise ValueError("hybrid index has no built sub-index")

        empty = (np.full(fetch_k, -1, np.int32), np.zeros(fetch_k, np.float32))
        ids_d, scores_d = (
            self._dense_candidates(query, fetch_k, filters) if have_dense else empty
        )
        ids_s, scores_s = (
            self._sparse_candidates(query, fetch_k, filters) if have_sparse else empty
        )

        if fusion_method == "rrf":
            fused_ids, fused_scores = rrf_fuse_device(
                jnp.asarray(ids_d), jnp.asarray(ids_s), top_k
            )
        else:
            fused_ids, fused_scores = weighted_fuse_device(
                jnp.asarray(ids_d), jnp.asarray(scores_d),
                jnp.asarray(ids_s), jnp.asarray(scores_s),
                top_k, weight_a=vector_weight, weight_b=bm25_weight,
            )

        results = []
        for i, score in zip(np.asarray(fused_ids), np.asarray(fused_scores)):
            if i < 0 or i >= len(self.chunks):
                continue
            chunk = self.chunks[int(i)]
            results.append({
                "chunk_id": chunk.chunk_id,
                "doc_id": chunk.doc_id,
                "source": chunk.source,
                "chunk_type": chunk.chunk_type,
                "text": chunk.text,
                "metadata": chunk.metadata,
                "score": float(score),
                "fusion_method": fusion_method,
            })
        return results

    # ------------------------------------------------------------------ info

    def get_stats(self) -> Dict:
        return {
            "num_chunks": len(self.chunks),
            "dense": self.dense_index.get_stats() if self.dense_index else None,
            "bm25": self.bm25_index.get_stats() if self.bm25_index else None,
        }
