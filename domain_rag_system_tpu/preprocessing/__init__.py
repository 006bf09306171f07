from domain_rag_system_tpu.preprocessing.documents import Chunk, Document
from domain_rag_system_tpu.preprocessing.data_loader import DataLoader
from domain_rag_system_tpu.preprocessing.chunker import DocumentChunker
from domain_rag_system_tpu.preprocessing.normalizer import MedicalTermNormalizer
from domain_rag_system_tpu.preprocessing.query_preprocessor import QueryPreprocessor
from domain_rag_system_tpu.preprocessing.sentence_split import split_sentences
from domain_rag_system_tpu.preprocessing.structured import StructuredQueryParser

__all__ = [
    "Document",
    "Chunk",
    "DataLoader",
    "DocumentChunker",
    "MedicalTermNormalizer",
    "QueryPreprocessor",
    "StructuredQueryParser",
    "split_sentences",
]
