from domain_rag_system_tpu.ops.sparse_bm25 import bm25_scores, build_okapi_arrays
from domain_rag_system_tpu.ops.dense_topk import cosine_topk, dense_scores
from domain_rag_system_tpu.ops.fusion import rrf_fuse_device, weighted_fuse_device

__all__ = [
    "bm25_scores",
    "build_okapi_arrays",
    "cosine_topk",
    "dense_scores",
    "rrf_fuse_device",
    "weighted_fuse_device",
]
