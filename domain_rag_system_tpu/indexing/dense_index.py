"""HBM-resident dense vector index.

Replaces the reference's Qdrant collection
(``src/indexing/vector_indexer.py:21-249``, local-mode client = pure-Python
scan per query) with a flat [N, d] matrix on device scored by an MXU matmul
and ``lax.top_k`` (:mod:`domain_rag_system_tpu.ops.dense_topk`).

The corpus is padded to a multiple of ``row_block`` (Pallas tile size /
sharding divisibility); padded rows carry a zero validity mask and can never
be returned. Metadata filters become cached [N] masks applied *before*
top-k — exact filtered retrieval, unlike the reference BM25 path's post-hoc
truncation.

Supported distances: cosine (default — embeddings and queries L2-normalized,
dot product on device) and dot. The reference's Euclid option
(``vector_indexer.py:57-62``) is exposed as ``"euclid"`` and computed from
the same matmul via the norm-expansion identity.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from domain_rag_system_tpu.indexing.filters import FilterSet
from domain_rag_system_tpu.ops.dense_topk import cosine_topk
from domain_rag_system_tpu.preprocessing.documents import Chunk
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


class DenseIndex:
    """Flat dense index: encode → device matmul → top-k."""

    def __init__(
        self,
        embedder,
        collection_name: str = "medical_rag",
        distance: str = "cosine",
        row_block: int = 1024,
        dtype: str = "float32",     # "float32" | "bfloat16" | "int8" | "auto"
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``"shard"`` axis —
        the embedding matrix is row-sharded across it (``parallel/mesh.py``)
        and every jitted consumer auto-partitions via the SPMD partitioner
        (the corpus-scaling path; see ``parallel/sharded_search.py`` for the
        explicit-collective variant)."""
        if distance not in ("cosine", "dot", "euclid"):
            raise ValueError(f"unsupported distance {distance!r}")
        if dtype not in ("float32", "bfloat16", "int8", "auto"):
            raise ValueError(f"unsupported dtype {dtype!r}")
        self.embedder = embedder
        self.collection_name = collection_name
        self.distance = distance
        self.row_block = row_block
        self._dtype_spec = dtype
        self._resolve_dtype("float32" if dtype == "auto" else dtype)
        self.mesh = mesh
        self.row_scale = None  # [N_pad] f32 dequant scales (int8 mode)

        self.chunks: List[Chunk] = []
        self.embeddings: Optional[jnp.ndarray] = None  # [N_pad, d] device
        self._row_norms_sq: Optional[jnp.ndarray] = None  # for euclid
        self._valid: Optional[np.ndarray] = None       # [N_pad] uint8
        self._valid_dev: Optional[jnp.ndarray] = None  # device cache of above
        self._filters: Optional[FilterSet] = None
        self.n_chunks = 0

    def valid_rows(self) -> jnp.ndarray:
        """[N_pad] uint8 validity mask ON DEVICE, cached — uploading the
        host mask per dispatch cost one transfer (92 KB + a tunnel round
        trip at 91k rows) on EVERY batch."""
        if self._valid_dev is None:
            self._valid_dev = jnp.asarray(self._valid)
        return self._valid_dev

    def _resolve_dtype(self, spec: str) -> None:
        self.quantize = spec == "int8"
        self.dtype = jnp.bfloat16 if spec == "bfloat16" else jnp.float32

    # ------------------------------------------------------------------ build

    def index_chunks(
        self,
        chunks: Sequence[Chunk],
        batch_size: int = 256,
        precomputed: Optional[np.ndarray] = None,
    ) -> None:
        """Embed and store all chunk texts (or adopt precomputed embeddings)."""
        self.chunks = list(chunks)
        self.n_chunks = len(self.chunks)
        if self._dtype_spec == "auto":
            # measured on v5e: at ≥~16k rows the fused query program runs
            # ~3× faster with bf16 corpus rows than f32 (identical ranking);
            # below that f32 wins slightly (PERFORMANCE.md)
            self._resolve_dtype("float32" if self.n_chunks < 16384
                                else "bfloat16")

        if precomputed is not None:
            emb = np.asarray(precomputed, dtype=np.float32)
        else:
            if hasattr(self.embedder, "fit") and not getattr(self.embedder, "is_fit", True):
                self.embedder.fit([c.text for c in self.chunks])
            parts = []
            normalize = self.distance == "cosine"
            for start in range(0, self.n_chunks, batch_size):
                batch = self.chunks[start:start + batch_size]
                parts.append(self.embedder.encode([c.text for c in batch],
                                                  normalize=normalize))
            emb = np.concatenate(parts, axis=0) if parts else np.zeros((0, 1), np.float32)

        block = self.row_block
        if self.mesh is not None:
            # rows must divide evenly across the shard axis
            shards = self.mesh.shape.get("shard", 1)
            block = -(-block // shards) * shards
        n_pad = -(-max(self.n_chunks, 1) // block) * block
        d = emb.shape[1] if emb.size else self.embedder.embedding_dim
        padded = np.zeros((n_pad, d), dtype=np.float32)
        padded[: self.n_chunks] = emb
        if self.quantize:
            # int8 symmetric per-row quantization: 4x less HBM per corpus
            # row; scores rescale per row after the matmul (ops/dense_topk).
            from domain_rag_system_tpu.ops.dense_topk import quantize_rows_int8

            q, scale = quantize_rows_int8(padded)
            self.embeddings = jnp.asarray(q)
            self.row_scale = jnp.asarray(scale)
        else:
            self.embeddings = jnp.asarray(padded, dtype=self.dtype)
            self.row_scale = None
        if self.mesh is not None:
            from domain_rag_system_tpu.parallel.mesh import shard_rows

            self.embeddings = shard_rows(self.embeddings, self.mesh)
            if self.row_scale is not None:
                self.row_scale = shard_rows(self.row_scale, self.mesh)
        if self.distance == "euclid":
            self._row_norms_sq = jnp.sum(
                jnp.asarray(padded, jnp.float32) ** 2, axis=1
            )

        self._valid = np.zeros(n_pad, dtype=np.uint8)
        self._valid[: self.n_chunks] = 1
        self._valid_dev = None
        self._filters = FilterSet(self.chunks)
        log.info("dense index: %d chunks (padded to %d), dim=%d, distance=%s",
                 self.n_chunks, n_pad, d, self.distance)

    # ------------------------------------------------------------- mutation

    def add_chunks(self, chunks: Sequence[Chunk], batch_size: int = 256) -> None:
        """Append chunks to the live index (Qdrant-upsert equivalent,
        reference ``vector_indexer.py:105-163``).

        New rows fill the existing padding; when capacity is exceeded the
        matrix grows by ``row_block`` multiples (one recompile per growth,
        not per add).
        """
        if self.embeddings is None:
            self.index_chunks(chunks, batch_size=batch_size)
            return
        chunks = list(chunks)
        normalize = self.distance == "cosine"
        new_emb = self.embedder.encode([c.text for c in chunks],
                                       normalize=normalize)
        old_n = self.n_chunks
        needed = old_n + len(chunks)
        if self.quantize:
            # dequantize to host f32, mutate, re-quantize below
            emb_host = (np.array(self.embeddings, dtype=np.float32)
                        * np.asarray(self.row_scale)[:, None])
        else:
            emb_host = np.array(self.embeddings, dtype=np.float32)  # writable copy
        if needed > emb_host.shape[0]:
            block = self.row_block
            if self.mesh is not None:
                shards = self.mesh.shape.get("shard", 1)
                block = -(-block // shards) * shards
            n_pad = -(-needed // block) * block
            grown = np.zeros((n_pad, emb_host.shape[1]), np.float32)
            grown[:old_n] = emb_host[:old_n]
            emb_host = grown
            # carry tombstones across the growth — a blanket [:old_n]=1
            # here silently resurrected deleted chunks on the dense arm
            old_valid = self._valid
            self._valid = np.zeros(n_pad, dtype=np.uint8)
            self._valid[:old_n] = old_valid[:old_n]
        emb_host[old_n:needed] = new_emb
        if self.quantize:
            from domain_rag_system_tpu.ops.dense_topk import quantize_rows_int8

            q8, scale = quantize_rows_int8(emb_host)
            self.embeddings = jnp.asarray(q8)
            self.row_scale = jnp.asarray(scale)
        else:
            self.embeddings = jnp.asarray(emb_host, dtype=self.dtype)
        if self.mesh is not None:
            from domain_rag_system_tpu.parallel.mesh import shard_rows

            self.embeddings = shard_rows(self.embeddings, self.mesh)
            if self.row_scale is not None:
                self.row_scale = shard_rows(self.row_scale, self.mesh)
        self.chunks.extend(chunks)
        self.n_chunks = needed
        self._valid[old_n:needed] = 1
        self._valid_dev = None
        self._filters = FilterSet(self.chunks)
        log.info("dense index: +%d chunks → %d (capacity %d)",
                 len(chunks), self.n_chunks, self.embeddings.shape[0])

    def delete_chunks(self, chunk_ids: Sequence[str]) -> int:
        """Tombstone chunks by id (rows stay allocated, never returned;
        Qdrant-delete equivalent, reference ``vector_indexer.py:241-249``)."""
        targets = set(chunk_ids)
        deleted = 0
        valid = self._valid.copy()
        for i, chunk in enumerate(self.chunks):
            if chunk.chunk_id in targets and valid[i]:
                valid[i] = 0
                deleted += 1
        self._valid = valid
        self._valid_dev = None
        log.info("dense index: tombstoned %d chunks", deleted)
        return deleted

    # ------------------------------------------------------------------ query

    def _combined_mask(self, filters: Optional[Dict]) -> np.ndarray:
        mask = self._valid
        extra = self._filters.mask(filters)
        if extra is not None:
            mask = mask.copy()
            mask[: self.n_chunks] &= extra
        return mask

    def search_batch(
        self,
        queries: Sequence[str],
        top_k: int = 10,
        filters: Optional[Dict] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores [B, k], indices [B, k]); indices are -1 beyond corpus."""
        if self.embeddings is None:
            raise ValueError("Index not built. Call index_chunks() first.")
        normalize = self.distance == "cosine"
        q = self.embedder.encode(list(queries), normalize=normalize)
        mask = self._combined_mask(filters)
        k = min(top_k, self.n_chunks)
        scores, idx = cosine_topk(
            jnp.asarray(q, dtype=self.dtype),
            self.embeddings,
            k,
            mask=jnp.asarray(mask),
            row_scale=self.row_scale,
        )
        scores = np.asarray(scores, dtype=np.float32)
        idx = np.asarray(idx)
        # masked/tombstoned slots must be detected on the RAW top-k scores —
        # the euclid transform below rewrites -1e30 into a finite value.
        invalid = scores <= -1e29
        if self.distance == "euclid":
            # ||q - e||² = ||q||² - 2q·e + ||e||²; top-k by dot is not top-k by
            # euclid unless normalized, so recompute the true distances for the
            # returned candidates (cosine-normalized corpora are unaffected)
            # and re-sort the k candidates by them.
            qn = np.sum(q ** 2, axis=1, keepdims=True)
            en = np.asarray(self._row_norms_sq)[idx]
            dist = -np.sqrt(np.maximum(qn - 2.0 * scores + en, 0.0))
            scores = np.where(invalid, np.float32(-1e30), dist)
            order = np.argsort(-scores, axis=1, kind="stable")
            scores = np.take_along_axis(scores, order, axis=1)
            idx = np.take_along_axis(idx, order, axis=1)
            invalid = scores <= -1e29
        idx = np.where(invalid | (idx >= self.n_chunks), -1, idx)
        return scores, idx

    def search(
        self,
        query: str,
        top_k: int = 10,
        filters: Optional[Dict] = None,
        score_threshold: Optional[float] = None,
    ) -> List[Dict]:
        """Reference-schema result dicts for one query
        (cf. ``vector_indexer.py:165-230``)."""
        scores, idx = self.search_batch([query], top_k=top_k, filters=filters)
        results = []
        for score, i in zip(scores[0], idx[0]):
            if i < 0:
                continue
            if score_threshold is not None and score < score_threshold:
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
            })
        return results

    # ------------------------------------------------------------------ info

    def get_stats(self) -> Dict:
        if self.embeddings is None:
            return {"error": "Index not built"}
        return {
            "collection_name": self.collection_name,
            "num_chunks": self.n_chunks,
            "embedding_dim": int(self.embeddings.shape[1]),
            "distance": self.distance,
            "padded_rows": int(self.embeddings.shape[0]),
            "dtype": str(self.embeddings.dtype),
        }
