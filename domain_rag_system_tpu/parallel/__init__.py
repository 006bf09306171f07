from domain_rag_system_tpu.parallel.mesh import get_mesh, shard_rows
from domain_rag_system_tpu.parallel.multihost import (
    global_replicated,
    global_sharded_rows,
    init_multihost,
    process_slice,
)
from domain_rag_system_tpu.parallel.sharded_search import (
    sharded_bm25_topk,
    sharded_cosine_topk,
)

__all__ = [
    "get_mesh",
    "shard_rows",
    "sharded_cosine_topk",
    "sharded_bm25_topk",
    "init_multihost",
    "process_slice",
    "global_sharded_rows",
    "global_replicated",
]
