"""Pipeline construction from a :class:`RetrievalConfig`.

One builder shared by ``bench.py``, ``scripts/evaluate.py`` and
``scripts/scale_bench.py`` so the benchmark, the evaluation and the scale
run can never drift apart in how they assemble the serving stack
(VERDICT.md round-1 item 10).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Tuple

from domain_rag_system_tpu.config import RetrievalConfig
from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.models import MedicalEmbedder
from domain_rag_system_tpu.pipeline import RetrievalPipeline
from domain_rag_system_tpu.preprocessing import (
    Chunk,
    DataLoader,
    DocumentChunker,
    QueryPreprocessor,
)
from domain_rag_system_tpu.preprocessing.normalizer import MedicalTermNormalizer
from domain_rag_system_tpu.reranker import build_reranker
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


def build_embedder(cfg: RetrievalConfig) -> MedicalEmbedder:
    if cfg.encoder_checkpoint:
        # batch 128: corpus encode costs dispatches through the remote
        # tunnel (~0.8 s each), so fewer, larger batches win
        return MedicalEmbedder(backend="bert",
                               checkpoint_path=cfg.encoder_checkpoint,
                               batch_size=128)
    return MedicalEmbedder(dim=cfg.embedding_dim)


def build_pipeline(
    cfg: RetrievalConfig,
    corpus_kwargs: Optional[Dict] = None,
    chunks: Optional[Sequence[Chunk]] = None,
    extra_chunks: Optional[Sequence[Chunk]] = None,
) -> Tuple[RetrievalPipeline, Dict]:
    """Load corpora → chunk → index → assemble the serving pipeline.

    Pass either ``corpus_kwargs`` (DataLoader paths) or prebuilt ``chunks``.
    ``extra_chunks`` appends synthetic/distractor chunks (scale benching).
    Returns (pipeline, build_info) where build_info records sizes/timings
    for the benchmark artifacts.
    """
    docs = []
    if chunks is None:
        docs = DataLoader(**(corpus_kwargs or {})).load_all(missing_ok=True)
        chunks = DocumentChunker().chunk_documents(docs)
    chunks = list(chunks)
    n_real = len(chunks)
    if extra_chunks:
        chunks += list(extra_chunks)

    # The normalizer is built BEFORE indexing so cfg.normalize_index can
    # canonicalize chunk text with the same tables queries are normalized
    # with (symmetric brand↔generic matching).
    normalizer = MedicalTermNormalizer()
    if cfg.mine_terms:
        if docs:
            normalizer.build_drug_mapping_from_data(docs)
        normalizer.mine_terms_from_texts([c.text for c in chunks[:n_real]])
    preprocessor = QueryPreprocessor(medical_normalizer=normalizer)

    embedder = build_embedder(cfg)
    hybrid = HybridIndex(
        dense_index=DenseIndex(embedder, dtype=cfg.dense_dtype),
        bm25_index=BM25Index(k1=cfg.bm25_k1, b=cfg.bm25_b,
                             band_k=cfg.bm25_band,
                             text_normalizer=(normalizer
                                              if cfg.normalize_index
                                              else None)),
    )
    t0 = time.perf_counter()
    hybrid.index_chunks(chunks)
    build_s = time.perf_counter() - t0

    reranker = build_reranker(cfg.reranker, top_n=cfg.rerank_top_n,
                              embedder=embedder,
                              cross_checkpoint=cfg.cross_checkpoint,
                              blend=cfg.rerank_blend)
    pipeline = RetrievalPipeline(hybrid, query_preprocessor=preprocessor,
                                 reranker=reranker)
    info = {
        "n_chunks": len(chunks),
        "n_real_chunks": n_real,
        "index_build_s": round(build_s, 2),
        "encoder": embedder.backend_name,
        "config": cfg.to_dict(),
    }
    return pipeline, info
