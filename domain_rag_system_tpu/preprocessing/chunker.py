"""Source-aware document chunking.

Behavioral parity with the reference ``DocumentChunker``
(``src/preprocessing/chunker.py:29-410``):

  * PubMed: title chunk + abstract chunk(s), sentence-split with a
    one-sentence overlap when the abstract exceeds ``max_chunk_size``
    (reference ``:66-106``, ``:324-380``);
  * OpenFDA: regex section headers → 10 chunk types
    (reference ``_parse_openfda_sections``, ``:143-202``);
  * Kaggle: ``=== X ===`` section split + section-name normalization map
    (reference ``:229-286``);
  * chunk IDs: ``{doc_id}_{type}`` for whole sections,
    ``{doc_id}_{type}_{i}`` for split pieces.

Defaults: ``max_chunk_size=512`` characters, ``overlap=50`` (reference
``:32-35``). The reference's per-call spaCy model reload bug (``:329``) does
not exist here — the sentence splitter is a pure function
(:mod:`domain_rag_system_tpu.preprocessing.sentence_split`).
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List

from domain_rag_system_tpu.preprocessing.documents import Chunk, Document
from domain_rag_system_tpu.preprocessing.sentence_split import split_sentences
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

# OpenFDA section header patterns, in the ETL's field order (the ETL writes
# "Field name:"-prefixed lines — data/OpenFDA Drug data/data_extractor.py:88-174).
_OPENFDA_SECTIONS = [
    ("drug_names", r"Drug names?:"),
    ("active_ingredients", r"Active ingredients?:?"),
    ("indications", r"Indications and usage:?"),
    ("dosage", r"Dosage and administration:?"),
    ("warnings", r"Warning information:?"),
    ("purpose", r"Purpose:?"),
    ("pregnancy", r"Pregnancy information:?"),
    ("overdosage", r"Overdosage:?"),
    ("inactive_ingredients", r"Inactive ingredients?:?"),
    ("other_info", r"Other (?:safety )?information:?"),
]
_OPENFDA_COMPILED = [
    (name, re.compile(pattern, re.IGNORECASE)) for name, pattern in _OPENFDA_SECTIONS
]

_KAGGLE_HEADER = re.compile(r"===\s+([A-Z\s()]+)\s+===")

_KAGGLE_SECTION_NAMES = {
    "BASIC INFORMATION": "basic_info",
    "BRAND NAMES": "brand_names",
    "SIDE EFFECTS": "side_effects",
    "SIDE EFFECTS (RAW)": "side_effects_raw",
    "SAFETY INFORMATION": "safety_info",
    "RELATED DRUGS": "related_drugs",
    "CONDITION INFORMATION": "condition_info",
}


class DocumentChunker:
    """Splits documents into retrieval chunks by source-specific strategy."""

    def __init__(self, max_chunk_size: int = 512, overlap: int = 50,
                 sentence_split: bool = True):
        self.max_chunk_size = max_chunk_size
        self.overlap = overlap
        self.sentence_split = sentence_split

    # ------------------------------------------------------------------ API

    def chunk_documents(self, documents: List[Document]) -> List[Chunk]:
        chunks: List[Chunk] = []
        dispatch = {
            "pubmed": self._chunk_pubmed,
            "openfda": self._chunk_openfda,
            "kaggle": self._chunk_kaggle,
        }
        for doc in documents:
            chunks.extend(dispatch.get(doc.source, self._chunk_generic)(doc))
        log.info("generated %d chunks from %d documents", len(chunks), len(documents))
        return chunks

    def stats(self, chunks: List[Chunk]) -> Dict:
        by_type = Counter(c.chunk_type for c in chunks)
        by_source = Counter(c.source for c in chunks)
        lengths = [len(c.text) for c in chunks]
        return {
            "total_chunks": len(chunks),
            "chunks_by_type": dict(by_type),
            "chunks_by_source": dict(by_source),
            "avg_chunk_chars": (sum(lengths) / len(lengths)) if lengths else 0.0,
            "max_chunk_chars": max(lengths) if lengths else 0,
        }

    # ------------------------------------------------------- per-source

    def _title_chunk(self, doc: Document) -> List[Chunk]:
        if not doc.title:
            return []
        return [Chunk(
            chunk_id=f"{doc.doc_id}_title",
            doc_id=doc.doc_id,
            source=doc.source,
            chunk_type="title",
            text=doc.title,
            metadata={**doc.metadata, "section": "title"},
        )]

    def _chunk_pubmed(self, doc: Document) -> List[Chunk]:
        chunks = self._title_chunk(doc)
        if doc.content:
            if len(doc.content) <= self.max_chunk_size:
                chunks.append(Chunk(
                    chunk_id=f"{doc.doc_id}_abstract",
                    doc_id=doc.doc_id,
                    source=doc.source,
                    chunk_type="abstract",
                    text=doc.content,
                    metadata={**doc.metadata, "section": "abstract"},
                ))
            else:
                chunks.extend(self._split_section(doc, "abstract", doc.content))
        return chunks

    def _chunk_openfda(self, doc: Document) -> List[Chunk]:
        chunks = self._title_chunk(doc)
        if not doc.content:
            return chunks

        text = doc.content
        positions = []
        for section_type, pattern in _OPENFDA_COMPILED:
            for m in pattern.finditer(text):
                positions.append((m.start(), section_type, m.group()))
        positions.sort(key=lambda p: p[0])

        for i, (start, section_type, header) in enumerate(positions):
            end = positions[i + 1][0] if i + 1 < len(positions) else len(text)
            body = text[start:end].strip()[len(header):].strip()
            if not body:
                continue
            chunks.extend(self._section_chunks(doc, section_type, body))
        return chunks

    def _chunk_kaggle(self, doc: Document) -> List[Chunk]:
        chunks = self._title_chunk(doc)
        if not doc.content:
            return chunks

        parts = re.split(r"(===\s+[A-Z\s()]+\s+===)", doc.content)
        section_type = None
        body_parts: List[str] = []
        for part in parts:
            part = part.strip()
            if not part:
                continue
            m = _KAGGLE_HEADER.match(part)
            if m:
                if section_type and body_parts:
                    chunks.extend(
                        self._section_chunks(doc, section_type, "\n".join(body_parts))
                    )
                name = m.group(1).strip()
                section_type = _KAGGLE_SECTION_NAMES.get(
                    name, name.lower().replace(" ", "_")
                )
                body_parts = []
            else:
                body_parts.append(part)
        if section_type and body_parts:
            chunks.extend(self._section_chunks(doc, section_type, "\n".join(body_parts)))
        return chunks

    def _chunk_generic(self, doc: Document) -> List[Chunk]:
        full_text = f"{doc.title}\n{doc.content}"
        return self._split_by_words(doc, "generic", full_text)

    # ------------------------------------------------------- splitting

    def _section_chunks(self, doc: Document, section_type: str, body: str) -> List[Chunk]:
        body = body.strip()
        if not body:
            return []
        if len(body) > self.max_chunk_size:
            return self._split_section(doc, section_type, body)
        return [Chunk(
            chunk_id=f"{doc.doc_id}_{section_type}",
            doc_id=doc.doc_id,
            source=doc.source,
            chunk_type=section_type,
            text=body,
            metadata={**doc.metadata, "section": section_type},
        )]

    def _split_section(self, doc: Document, section_type: str, text: str) -> List[Chunk]:
        if self.sentence_split:
            return self._split_by_sentences(doc, section_type, text)
        return self._split_by_words(doc, section_type, text)

    def _make_piece(self, doc: Document, section_type: str, index: int, text: str) -> Chunk:
        return Chunk(
            chunk_id=f"{doc.doc_id}_{section_type}_{index}",
            doc_id=doc.doc_id,
            source=doc.source,
            chunk_type=section_type,
            text=text,
            metadata={**doc.metadata, "section": section_type, "chunk_index": index},
        )

    def _split_by_sentences(self, doc: Document, section_type: str, text: str) -> List[Chunk]:
        """Greedy sentence packing with a one-sentence overlap between pieces
        (reference overlap semantics, ``chunker.py:355-366``)."""
        sentences = split_sentences(text)
        chunks: List[Chunk] = []
        current: List[str] = []
        current_len = 0
        for sentence in sentences:
            if len(sentence) > self.max_chunk_size:
                # an unsplittable over-long "sentence" (no boundaries found)
                # must not become an over-long chunk — fall back to word
                # windows for it so the ≤max_chunk_size contract holds
                if current:
                    chunks.append(self._make_piece(
                        doc, section_type, len(chunks), " ".join(current)))
                    current, current_len = [], 0
                for piece in self._word_pieces(sentence):
                    chunks.append(self._make_piece(
                        doc, section_type, len(chunks), piece))
                continue
            # current_len counts the JOINED length (sentences + one space
            # separator each) — counting sentences alone let short-sentence
            # text overflow the cap by up to 1.33x
            sep = 1 if current else 0
            if current and current_len + sep + len(sentence) > self.max_chunk_size:
                chunks.append(
                    self._make_piece(doc, section_type, len(chunks), " ".join(current))
                )
                # One-sentence overlap carry — but ONLY when the carried
                # sentence still fits alongside the incoming one: the carry
                # is a REPEAT of already-emitted text, and keeping it
                # unconditionally produced chunks up to carried+sentence
                # chars (measured 651 > 512 on synthetic input; 37/3,513
                # recovered-corpus chunks violated the ≤max contract).
                if (self.overlap > 0 and len(current) > 1
                        and len(current[-1]) + 1 + len(sentence)
                        <= self.max_chunk_size):
                    current = [current[-1]]
                    current_len = len(current[0])
                else:
                    current = []
                    current_len = 0
                sep = 1 if current else 0
            current.append(sentence)
            current_len += sep + len(sentence)
        if current:
            chunks.append(
                self._make_piece(doc, section_type, len(chunks), " ".join(current))
            )
        return chunks

    def _word_pieces(self, text: str) -> List[str]:
        """Fixed-stride word windows (~5 chars/word heuristic, reference
        ``:382-405``); any window still exceeding max_chunk_size (long
        words break the chars/word heuristic — worst case one unbroken
        100k-char token) is hard-sliced so the size contract holds."""
        words = text.split()
        words_per_chunk = max(1, self.max_chunk_size // 5)
        overlap_words = self.overlap // 5
        stride = max(1, words_per_chunk - overlap_words)
        pieces: List[str] = []
        for i in range(0, len(words), stride):
            piece = " ".join(words[i:i + words_per_chunk])
            while len(piece) > self.max_chunk_size:
                pieces.append(piece[: self.max_chunk_size])
                piece = piece[self.max_chunk_size:]
            if piece:
                pieces.append(piece)
        return pieces

    def _split_by_words(self, doc: Document, section_type: str, text: str) -> List[Chunk]:
        return [self._make_piece(doc, section_type, i, piece)
                for i, piece in enumerate(self._word_pieces(text))]
