from domain_rag_system_tpu.indexing.bm25_index import BM25Index
from domain_rag_system_tpu.indexing.dense_index import DenseIndex
from domain_rag_system_tpu.indexing.hybrid import HybridIndex
from domain_rag_system_tpu.indexing.filters import FilterSet

__all__ = ["BM25Index", "DenseIndex", "HybridIndex", "FilterSet"]
