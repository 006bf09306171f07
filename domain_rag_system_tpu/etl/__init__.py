from domain_rag_system_tpu.etl.recover import (
    recover_bioasq_corpus,
    recover_bioasq_queries,
    recover_openfda_corpus,
    recover_openfda_queries,
    synthesize_kaggle_corpus,
)

__all__ = [
    "recover_bioasq_corpus",
    "recover_bioasq_queries",
    "recover_openfda_corpus",
    "recover_openfda_queries",
    "synthesize_kaggle_corpus",
]
