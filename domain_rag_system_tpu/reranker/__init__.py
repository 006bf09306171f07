from domain_rag_system_tpu.reranker.rerank import (
    BaseReranker,
    CrossEncoderReranker,
    SimpleSimilarityReranker,
    build_reranker,
)

__all__ = [
    "BaseReranker",
    "SimpleSimilarityReranker",
    "CrossEncoderReranker",
    "build_reranker",
]
