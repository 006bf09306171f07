"""Core document/chunk schema.

Parity: ``Document`` mirrors the reference dataclass at
``src/preprocessing/data_loader.py:7-22`` and ``Chunk`` mirrors
``src/preprocessing/chunker.py:9-26`` so that serialized artifacts
(documents.jsonl / chunks.jsonl) are schema-compatible with the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict


@dataclass
class Document:
    doc_id: str
    source: str  # 'pubmed' | 'openfda' | 'kaggle'
    title: str
    content: str
    metadata: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "doc_id": self.doc_id,
            "source": self.source,
            "title": self.title,
            "content": self.content,
            "metadata": self.metadata,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Document":
        return cls(
            doc_id=d["doc_id"],
            source=d["source"],
            title=d.get("title", ""),
            content=d.get("content", ""),
            metadata=d.get("metadata", {}),
        )


@dataclass
class Chunk:
    chunk_id: str
    doc_id: str
    source: str
    chunk_type: str  # 'title', 'abstract', 'basic_info', 'side_effects', ...
    text: str
    metadata: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "chunk_id": self.chunk_id,
            "doc_id": self.doc_id,
            "source": self.source,
            "chunk_type": self.chunk_type,
            "text": self.text,
            "metadata": self.metadata,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Chunk":
        return cls(
            chunk_id=d["chunk_id"],
            doc_id=d["doc_id"],
            source=d["source"],
            chunk_type=d["chunk_type"],
            text=d["text"],
            metadata=d.get("metadata", {}),
        )
