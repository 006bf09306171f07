from domain_rag_system_tpu.models.embedder import MedicalEmbedder
from domain_rag_system_tpu.models.hash_embedder import LexicalHashEmbedder

__all__ = ["MedicalEmbedder", "LexicalHashEmbedder"]
