from domain_rag_system_tpu.evaluation.metrics import (
    answer_metrics,
    calculate_retrieval_metrics,
    hit_at_k,
    lcs_rouge_l,
    mean_metrics,
    ndcg_at_k,
    recall_at_k,
    token_f1,
)

__all__ = [
    "calculate_retrieval_metrics",
    "recall_at_k",
    "ndcg_at_k",
    "hit_at_k",
    "mean_metrics",
    "answer_metrics",
    "token_f1",
    "lcs_rouge_l",
]
