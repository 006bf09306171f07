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
    if getattr(cfg, "encoder_stack", None):
        return MedicalEmbedder(backend="stacked",
                               stack=list(cfg.encoder_stack),
                               batch_size=128)
    if cfg.encoder_checkpoint:
        # batch 128: corpus encode costs dispatches through the remote
        # tunnel (~0.8 s each), so fewer, larger batches win
        return MedicalEmbedder(backend="bert",
                               checkpoint_path=cfg.encoder_checkpoint,
                               batch_size=128)
    return MedicalEmbedder(dim=cfg.embedding_dim)


def _embedding_cache_key(chunks: Sequence[Chunk], cfg: RetrievalConfig) -> str:
    """Content key for the corpus-embedding cache: encoder identity +
    dense dtype + an md5 over every chunk id and text (any corpus,
    checkpoint or dtype change invalidates). The cached array holds the
    DEVICE rows (already cast to the index dtype), so a bf16-built cache
    must never satisfy an explicit float32 build — bf16 rounding flips
    near-tie rankings (PERFORMANCE.md band-precision note)."""
    import hashlib

    h = hashlib.md5()
    h.update(str(cfg.encoder_checkpoint or f"hash{cfg.embedding_dim}").encode())
    h.update(str(getattr(cfg, "encoder_stack", None)).encode())
    h.update(str(cfg.dense_dtype).encode())
    for c in chunks:
        h.update(c.chunk_id.encode())
        h.update(c.text.encode("utf-8", "ignore"))
    return h.hexdigest()


def build_pipeline(
    cfg: RetrievalConfig,
    corpus_kwargs: Optional[Dict] = None,
    chunks: Optional[Sequence[Chunk]] = None,
    extra_chunks: Optional[Sequence[Chunk]] = None,
    embedding_cache_dir: Optional[str] = None,
) -> Tuple[RetrievalPipeline, Dict]:
    """Load corpora → chunk → index → assemble the serving pipeline.

    Pass either ``corpus_kwargs`` (DataLoader paths) or prebuilt ``chunks``.
    ``extra_chunks`` appends synthetic/distractor chunks (scale benching).
    ``embedding_cache_dir`` (opt-in; sweep tooling) caches the corpus
    embedding matrix on disk keyed by encoder identity + corpus content —
    a 91k-chunk re-encode costs ~13 min on the single-core host, so grid
    sweeps that rebuild the same index pay it once.
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
    precomputed = None
    cache_path = None
    if embedding_cache_dir and not (cfg.encoder_checkpoint
                                    or getattr(cfg, "encoder_stack", None)):
        # hash/keyword embedders may fit a vocabulary during corpus encode
        # (needed again at query time) and encode cheaply anyway — cache
        # only the expensive BERT path
        log.info("embedding cache skipped (no encoder checkpoint)")
        embedding_cache_dir = None
    if embedding_cache_dir:
        from pathlib import Path

        import numpy as np

        key = _embedding_cache_key(chunks, cfg)
        cache_path = Path(embedding_cache_dir) / f"emb_{key}.npz"
        if cache_path.exists():
            precomputed = np.load(cache_path)["embeddings"]
            log.info("corpus embeddings loaded from cache %s", cache_path)

    t0 = time.perf_counter()
    hybrid.index_chunks(chunks, precomputed_embeddings=precomputed)
    build_s = time.perf_counter() - t0

    if (cache_path is not None and precomputed is None
            and hybrid.dense_index is not None
            and hybrid.dense_index.row_scale is None):
        # int8 indexes store quantized rows — caching those would feed
        # wrong-scale values back through the f32 precomputed path, so
        # only the f32/bf16 layouts are cached (bf16 rounding is
        # idempotent: reload + re-cast reproduces identical device rows)
        from pathlib import Path

        import numpy as np

        Path(embedding_cache_dir).mkdir(parents=True, exist_ok=True)
        emb = np.asarray(hybrid.dense_index.embeddings,
                         dtype=np.float32)[: len(chunks)]
        np.savez_compressed(cache_path, embeddings=emb)
        log.info("corpus embeddings cached to %s", cache_path)

    reranker = build_reranker(cfg.reranker, top_n=cfg.rerank_top_n,
                              embedder=embedder,
                              cross_checkpoint=cfg.cross_checkpoint,
                              blend=cfg.rerank_blend,
                              head_m=getattr(cfg, "rerank_head_m", 0))
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
