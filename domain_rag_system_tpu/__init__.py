"""domain_rag_system_tpu — a TPU-native medical hybrid-RAG framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Luyu-H/Domain-RAG-System (see SURVEY.md): three medical corpora →
section-aware chunking → hybrid (dense + BM25) retrieval → RRF/weighted
fusion → reranking → optional LLM generation → retrieval-metric evaluation.

Unlike the reference (which delegates to Qdrant / rank_bm25 /
sentence-transformers on CPU/GPU), the hot path here is a single on-device
program: a query enters the chip as token ids and leaves as
(chunk_id, score) pairs — encode, dense top-k, sparse BM25 scoring, fusion
and rerank-candidate selection all run under `jax.jit`, sharded over a
`jax.sharding.Mesh` when more than one device is available.
"""

__version__ = "0.2.0"

from domain_rag_system_tpu.preprocessing import (  # noqa: F401
    Document,
    Chunk,
    DataLoader,
    DocumentChunker,
    MedicalTermNormalizer,
    QueryPreprocessor,
)
