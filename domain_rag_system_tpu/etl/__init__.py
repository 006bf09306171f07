from domain_rag_system_tpu.etl.recover import (
    recover_bioasq_corpus,
    recover_bioasq_queries,
    recover_openfda_corpus,
    recover_openfda_queries,
    synthesize_kaggle_corpus,
)
from domain_rag_system_tpu.etl.synthetic import synthetic_chunks

__all__ = [
    "recover_bioasq_corpus",
    "recover_bioasq_queries",
    "recover_openfda_corpus",
    "recover_openfda_queries",
    "synthesize_kaggle_corpus",
    "synthetic_chunks",
]
