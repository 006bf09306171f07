"""Candidate reranking.

Interface parity with the reference (``src/reranker/rerank.py:19-101``):
``rerank`` scores the top-``top_n`` pool against (query, text) pairs,
attaches ``rerank_score``, appends ``"+rerank"`` to ``fusion_method``, sorts
descending, returns top-k. Factory ``build_reranker`` supports
``none | simple | crossencoder`` with silent crossencoder→simple fallback
(``:87-101``), logged here instead of silent.

Differences:
  * ``SimpleSimilarityReranker`` scores all pairs in ONE batched device
    matmul — the reference loops a pure-Python cosine per pair
    (``rerank.py:53-68``), its biggest serving hot-spot (SURVEY.md §6:
    1.4–1.9 s/query);
  * ``CrossEncoderReranker`` is a first-party Flax cross-encoder
    (query, passage) forward at static padded shapes; it requires local
    parameters (no downloads) and raises at construction otherwise, which the
    factory converts into the simple-reranker fallback.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Literal, Optional, Tuple

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


class BaseReranker:
    """Pool-rerank interface (reference ``BaseReranker``, rerank.py:19-43).

    ``blend`` interpolates the reranker's scores with the incoming fusion
    ranking: ``final = (1-blend)·norm(rerank) + blend·norm(fusion)``. With
    blend=0 (reference behavior) a weak reranker can destroy a strong
    fusion ordering; blend>0 makes reranking strictly additive signal.
    """

    def __init__(self, top_n: int = 50, name: str = "base",
                 blend: float = 0.0, head_m: int = 0):
        self.top_n = top_n
        self.name = name
        self.blend = blend
        #: head-only doc reorder (round 4): > 0 switches the pipeline from
        #: pool reranking to reordering ONLY the top-``head_m`` grouped
        #: documents. The doc SET at every cutoff >= head_m is invariant,
        #: so recall@k (k >= head_m) cannot change — head precision
        #: (MRR / hit@1) is bought at zero recall cost, the failure mode
        #: every pool-blend operating point measured in
        #: results/cv_rerank_*.json pays for.
        self.head_m = head_m

    def score_pairs(self, pairs: Iterable[Tuple[str, str]]) -> List[float]:
        raise NotImplementedError

    def rerank(self, query: str, results: List[Dict], top_k: int = 10) -> List[Dict]:
        if not results:
            return results
        return self.rerank_batch([query], [results], top_k=top_k)[0]

    def rerank_batch(
        self,
        queries: List[str],
        results_lists: List[List[Dict]],
        top_k: int = 10,
    ) -> List[List[Dict]]:
        """Rerank many query pools with ONE ``score_pairs`` pass.

        The whole batch's (query, passage) pairs flatten into a single
        scoring call — for the cross-encoder that means a handful of large
        padded device forwards instead of one dispatch per query (each
        dispatch costs ~0.8 s through the remote-TPU tunnel)."""
        pools = [r[: min(self.top_n, len(r))] for r in results_lists]
        flat = [(q, r.get("text", "") or "")
                for q, pool in zip(queries, pools) for r in pool]
        scores = self.score_pairs(flat) if flat else []

        def norm(vals: List[float]) -> List[float]:
            lo, hi = min(vals), max(vals)
            span = hi - lo
            return [(v - lo) / span if span > 0 else 0.5 for v in vals]

        out: List[List[Dict]] = []
        i = 0
        for pool in pools:
            pool_scores = [float(scores[i + j]) for j in range(len(pool))]
            i += len(pool)
            if self.blend > 0 and pool:
                rr_n = norm(pool_scores)
                fu_n = norm([float(r.get("score", 0.0)) for r in pool])
                final = [(1.0 - self.blend) * a + self.blend * b
                         for a, b in zip(rr_n, fu_n)]
            else:
                final = pool_scores
            rescored = []
            for r, raw, f in zip(pool, pool_scores, final):
                new_r = r.copy()
                new_r["rerank_score"] = f
                new_r["rerank_raw"] = raw
                new_r["fusion_method"] = (
                    (new_r.get("fusion_method") or "pre") + "+rerank")
                rescored.append(new_r)
            rescored.sort(key=lambda x: x["rerank_score"], reverse=True)
            out.append(rescored[:top_k])
        return out


    def reorder_head(
        self,
        queries: List[str],
        grouped_lists: List[List[Dict]],
        m: Optional[int] = None,
        blend: Optional[float] = None,
    ) -> List[List[Dict]]:
        """Reorder only the top-``m`` DOC results per query.

        Each head doc scores as (query, its best chunk's text); the final
        head order sorts ``(1-blend)·norm(rerank) + blend·norm(doc score)``
        within the head (norms computed over the head only). Positions
        ``m..`` are untouched. One flattened ``score_pairs`` call covers
        the whole batch (B × m pairs — ~top_n/m cheaper than pool
        reranking)."""
        m = self.head_m if m is None else m
        blend = self.blend if blend is None else blend
        heads = [g[: min(m, len(g))] for g in grouped_lists]
        flat = [(q, r.get("text", "") or "")
                for q, head in zip(queries, heads) for r in head]
        scores = self.score_pairs(flat) if flat else []

        def norm(vals: List[float]) -> List[float]:
            lo, hi = min(vals), max(vals)
            span = hi - lo
            return [(v - lo) / span if span > 0 else 0.5 for v in vals]

        out: List[List[Dict]] = []
        i = 0
        for head, rest_src in zip(heads, grouped_lists):
            head_scores = [float(scores[i + j]) for j in range(len(head))]
            i += len(head)
            if not head:
                out.append(rest_src)
                continue
            if blend > 0:
                rr_n = norm(head_scores)
                fu_n = norm([float(r.get("doc_score", r.get("score", 0.0)))
                             for r in head])
                final = [(1.0 - blend) * a + blend * b
                         for a, b in zip(rr_n, fu_n)]
            else:
                final = head_scores
            rescored = []
            for r, raw, f in zip(head, head_scores, final):
                new_r = r.copy()
                new_r["rerank_score"] = f
                new_r["rerank_raw"] = raw
                new_r["fusion_method"] = (
                    (new_r.get("fusion_method") or "pre") + "+headreorder")
                rescored.append(new_r)
            rescored.sort(key=lambda x: x["rerank_score"], reverse=True)
            out.append(rescored + rest_src[len(head):])
        return out


class SimpleSimilarityReranker(BaseReranker):
    """Cosine rerank via the shared embedder — one batched matmul."""

    def __init__(self, embedder=None, top_n: int = 50):
        super().__init__(top_n=top_n, name="simple-sim")
        if embedder is None:
            from domain_rag_system_tpu.models import MedicalEmbedder

            embedder = MedicalEmbedder()
        self.embedder = embedder

    def score_pairs(self, pairs: Iterable[Tuple[str, str]]) -> List[float]:
        import numpy as np

        pairs = list(pairs)
        if not pairs:
            return []
        # pairs may span multiple queries (rerank_batch): encode each
        # distinct query once, all passages in one batch, score row-wise
        queries = [q for q, _ in pairs]
        unique = list(dict.fromkeys(queries))
        q_vecs = self.embedder.encode(unique, normalize=True)
        q_idx = {q: i for i, q in enumerate(unique)}
        d_vecs = self.embedder.encode([p for _, p in pairs], normalize=True)
        rows = np.asarray([q_idx[q] for q in queries])
        return np.sum(d_vecs * q_vecs[rows], axis=1).astype(float).tolist()


class CrossEncoderReranker(BaseReranker):
    """Flax cross-encoder (query, passage) → relevance logit."""

    def __init__(
        self,
        model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
        top_n: int = 50,
        checkpoint_path: Optional[str] = None,
    ):
        super().__init__(top_n=top_n, name="cross-encoder")
        from domain_rag_system_tpu.models.bert_embedder import CrossEncoderModel

        self.model = CrossEncoderModel(
            model_name=model_name, checkpoint_path=checkpoint_path
        )

    def score_pairs(self, pairs: Iterable[Tuple[str, str]]) -> List[float]:
        pairs = list(pairs)
        if not pairs:
            return []
        return [float(s) for s in self.model.predict(pairs)]


def build_reranker(
    kind: Literal["none", "simple", "crossencoder"] = "simple",
    top_n: int = 50,
    cross_model: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
    embedder=None,
    cross_checkpoint: Optional[str] = None,
    blend: float = 0.0,
    head_m: int = 0,
) -> Optional[BaseReranker]:
    """Reranker factory with reference fallback semantics."""
    if kind == "none":
        return None
    if kind == "crossencoder":
        try:
            rr = CrossEncoderReranker(
                model_name=cross_model, top_n=top_n,
                checkpoint_path=cross_checkpoint,
            )
            rr.blend = blend
            rr.head_m = head_m
            return rr
        except Exception as exc:
            log.warning(
                "cross-encoder %r unavailable (%s) — falling back to "
                "simple similarity reranker", cross_model, exc,
            )
    rr = SimpleSimilarityReranker(embedder=embedder, top_n=top_n)
    rr.blend = blend
    rr.head_m = head_m
    return rr
