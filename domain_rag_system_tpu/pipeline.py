"""End-to-end retrieval pipeline (the serving hot path).

Flow parity with ``scripts/query.py:92-180`` / ``scripts/rag.py:74-238``:
preprocess → search-query selection → hybrid search with
``fetch_k = max(top_k, rerank_top_n)`` over-fetch → optional rerank
(scored against the ORIGINAL query while retrieval used the preprocessed
one — reference behavior at ``query.py:141,160``) → results.

Unlike the reference (which re-instantiates models per script run and walks
indexes on the host), the pipeline holds device-resident indexes and
supports **batched** queries: dense scoring, BM25 scoring, fusion and
rerank-candidate selection all run as batched device programs, which is
where the ≥10× queries/sec target comes from.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

import functools

import jax

from domain_rag_system_tpu.indexing import HybridIndex
from domain_rag_system_tpu.ops.dense_topk import cosine_topk
from domain_rag_system_tpu.ops.fusion import rrf_fuse_device, weighted_fuse_device
from domain_rag_system_tpu.ops.sparse_bm25 import bm25_scores
from domain_rag_system_tpu.preprocessing import QueryPreprocessor
from domain_rag_system_tpu.reranker import BaseReranker, SimpleSimilarityReranker
from domain_rag_system_tpu.utils import StageTimer, get_logger, topk_desc

log = get_logger(__name__)


@functools.partial(jax.jit, static_argnames=("top_n",))
def _device_cosine_rerank(
    embeddings: jax.Array,  # [N_pad, d] L2-normalized corpus matrix
    q_emb: jax.Array,       # [B, d]   L2-normalized ORIGINAL-query embeddings
    cand_idx: jax.Array,    # [B, K] int32 fused candidate rows, -1 padded
    top_n: int,
) -> jax.Array:
    """Cosine rerank scores for fused candidates via embedding-table lookup.

    Semantically identical to ``SimpleSimilarityReranker.score_pairs`` —
    candidate texts ARE corpus chunks, so their embeddings are already in
    HBM; re-encoding them per query (as the reference does,
    ``rerank.py:60-68``) is pure waste. Candidates beyond ``top_n`` and
    padding slots score -inf (outside the rerank pool).
    """
    safe_idx = jnp.maximum(cand_idx, 0)
    cand_emb = jnp.take(embeddings, safe_idx, axis=0)          # [B, K, d]
    scores = jnp.einsum("bkd,bd->bk", cand_emb.astype(jnp.float32),
                        q_emb.astype(jnp.float32))
    in_pool = (jnp.arange(cand_idx.shape[1])[None, :] < top_n) & (cand_idx >= 0)
    return jnp.where(in_pool, scores, -1e30)


class RetrievalPipeline:
    """preprocess → hybrid retrieve → fuse → rerank."""

    def __init__(
        self,
        hybrid_index: HybridIndex,
        query_preprocessor: Optional[QueryPreprocessor] = None,
        reranker: Optional[BaseReranker] = None,
    ):
        self.index = hybrid_index
        self.preprocessor = query_preprocessor or QueryPreprocessor()
        self.reranker = reranker
        self.timer = StageTimer()

    # ----------------------------------------------------------- single query

    def query(
        self,
        query: str,
        top_k: int = 5,
        fusion_method: str = "rrf",
        vector_weight: float = 0.5,
        bm25_weight: float = 0.5,
        filters: Optional[Dict] = None,
        rerank_top_n: int = 50,
        preprocess: bool = True,
    ) -> Dict:
        with self.timer.stage("preprocess"):
            if preprocess:
                pre = self.preprocessor.preprocess(query)
                search_query = self.preprocessor.select_search_query(pre)
            else:
                pre = {"original": query, "cleaned": query, "normalized": query,
                       "entities": [], "medical_terms": {}}
                search_query = query

        fetch_k = max(top_k, rerank_top_n if self.reranker is not None else top_k)

        with self.timer.stage("search"):
            results = self.index.search(
                search_query,
                top_k=fetch_k,
                fusion_method=fusion_method,
                vector_weight=vector_weight,
                bm25_weight=bm25_weight,
                filters=filters,
            )

        if self.reranker is not None and results:
            with self.timer.stage("rerank"):
                results = self.reranker.rerank(query, results, top_k=top_k)
        else:
            results = results[:top_k]

        return {
            "query": query,
            "preprocessed": pre,
            "search_query": search_query,
            "num_results": len(results),
            "results": results,
        }

    # ------------------------------------------------------------ batch path

    def query_batch(
        self,
        queries: Sequence[str],
        top_k: int = 5,
        fusion_method: str = "rrf",
        vector_weight: float = 0.5,
        bm25_weight: float = 0.5,
        rerank_top_n: int = 50,
        preprocess: bool = True,
    ) -> List[Dict]:
        """Batched retrieval: heavy stages run once over the whole batch.

        Dense encode+top-k and BM25 scoring are [B, ...] device programs;
        fusion runs per query on device (cheap fixed-shape ops); reranking
        uses one batched embed per query pool.
        """
        queries = list(queries)
        if not queries:
            return []
        dense = self.index.dense_index
        sparse = self.index.bm25_index
        fetch_k = max(top_k, rerank_top_n if self.reranker is not None else top_k)
        over_k = fetch_k * 2  # hybrid over-fetch parity

        with self.timer.stage("preprocess"):
            if preprocess:
                pres = [self.preprocessor.preprocess(q) for q in queries]
                search_queries = [self.preprocessor.select_search_query(p) for p in pres]
            else:
                pres = [{"original": q, "cleaned": q, "normalized": q,
                         "entities": [], "medical_terms": {}} for q in queries]
                search_queries = queries

        ids_d = scores_d = ids_s = scores_s = None
        if dense is not None and dense.embeddings is not None:
            with self.timer.stage("dense"):
                scores_d, ids_d = dense.search_batch(search_queries, top_k=over_k)
        if sparse is not None and sparse.doc_terms is not None:
            with self.timer.stage("sparse"):
                q_enc = [sparse.encode_query(q) for q in search_queries]
                q_ids = jnp.asarray(np.stack([e[0] for e in q_enc]))
                q_w = jnp.asarray(np.stack([e[1] for e in q_enc]))
                s = np.asarray(bm25_scores(sparse.doc_terms, sparse.doc_contrib,
                                           q_ids, q_w,
                                           vocab_size=len(sparse.vocab)))
                ids_s = topk_desc(s, over_k).astype(np.int32)
                row = np.arange(s.shape[0])[:, None]
                scores_s = s[row, ids_s].astype(np.float32)

        with self.timer.stage("fuse"):
            fused = []
            for b in range(len(queries)):
                a_ids = (jnp.asarray(ids_d[b].astype(np.int32)) if ids_d is not None
                         else jnp.full((over_k,), -1, jnp.int32))
                b_ids = (jnp.asarray(ids_s[b]) if ids_s is not None
                         else jnp.full((over_k,), -1, jnp.int32))
                if fusion_method == "rrf":
                    f_ids, f_scores = rrf_fuse_device(a_ids, b_ids, fetch_k)
                else:
                    a_sc = (jnp.asarray(scores_d[b]) if scores_d is not None
                            else jnp.zeros((over_k,), jnp.float32))
                    b_sc = (jnp.asarray(scores_s[b]) if scores_s is not None
                            else jnp.zeros((over_k,), jnp.float32))
                    f_ids, f_scores = weighted_fuse_device(
                        a_ids, a_sc, b_ids, b_sc, fetch_k,
                        weight_a=vector_weight, weight_b=bm25_weight)
                fused.append((np.asarray(f_ids), np.asarray(f_scores)))

        # Device cosine rerank: applies when the reranker is the simple
        # similarity kind and the fused candidates live in the dense index —
        # then rerank is an embedding-table gather + einsum, no host text
        # re-encoding (exactly SimpleSimilarityReranker semantics).
        device_rerank_scores = None
        use_device_rerank = (
            isinstance(self.reranker, SimpleSimilarityReranker)
            and dense is not None and dense.embeddings is not None
            and self.reranker.embedder is dense.embedder
        )
        if use_device_rerank:
            with self.timer.stage("rerank"):
                q_orig = dense.embedder.encode(list(queries), normalize=True)
                cand_idx = np.stack([f[0] for f in fused]).astype(np.int32)
                device_rerank_scores = np.asarray(_device_cosine_rerank(
                    dense.embeddings, jnp.asarray(q_orig, dense.embeddings.dtype),
                    jnp.asarray(cand_idx), self.reranker.top_n,
                ))

        outputs = []
        for b, query in enumerate(queries):
            f_ids, f_scores = fused[b]
            results = []
            for i, score in zip(f_ids, f_scores):
                if i < 0:
                    continue
                chunk = self.index.chunks[int(i)]
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
            if use_device_rerank and results:
                rr_scores = device_rerank_scores[b]
                pool = min(self.reranker.top_n, len(results))
                rescored = []
                for j, r in enumerate(results[:pool]):
                    out_r = r.copy()
                    out_r["rerank_score"] = float(rr_scores[j])
                    out_r["fusion_method"] = r["fusion_method"] + "+rerank"
                    rescored.append(out_r)
                rescored.sort(key=lambda x: -x["rerank_score"])
                results = rescored[:top_k]
            elif self.reranker is not None and results:
                with self.timer.stage("rerank"):
                    results = self.reranker.rerank(query, results, top_k=top_k)
            else:
                results = results[:top_k]
            outputs.append({
                "query": query,
                "preprocessed": pres[b],
                "search_query": search_queries[b],
                "num_results": len(results),
                "results": results,
            })
        return outputs
