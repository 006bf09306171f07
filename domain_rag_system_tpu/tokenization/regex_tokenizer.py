"""Word-level tokenization for sparse (BM25) retrieval.

Tokenization parity with the reference's ``BM25Indexer.tokenize``
(``src/indexing/bm25_indexer.py:50-78``): lowercase, ``\\b\\w+\\b`` word
extraction, drop tokens shorter than 2 characters unless the token is a
preserved medical abbreviation that occurs in the text. Matching this
exactly matters: BM25 scores — and therefore hybrid RRF rankings — depend
on the token stream.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

_WORD = re.compile(r"\b\w+\b")


class RegexTokenizer:
    """Lowercasing word tokenizer with medical-abbreviation preservation."""

    def __init__(self, preserved_abbreviations: Optional[Iterable[str]] = None):
        if preserved_abbreviations is None:
            # Default to the normalizer's abbreviation table, as the
            # reference does (bm25_indexer.py:42,63-66).
            from domain_rag_system_tpu.preprocessing.normalizer import _load_tables

            preserved_abbreviations = _load_tables()["abbreviations"].keys()
        self._preserved = {a.lower() for a in preserved_abbreviations}

    def tokenize(self, text: str) -> List[str]:
        text = text.lower()
        # Reference semantics: an abbreviation is "preserved" for this text
        # only if it appears as a substring of the lowercased text.
        active = {a for a in self._preserved if a in text}
        return [
            t for t in _WORD.findall(text)
            if len(t) >= 2 or t in active
        ]

    def __call__(self, text: str) -> List[str]:
        return self.tokenize(text)


class Vocabulary:
    """Deterministic term <-> id mapping built from a tokenized corpus."""

    def __init__(self, terms: Sequence[str]):
        self.id_to_term: List[str] = list(terms)
        self.term_to_id: Dict[str, int] = {t: i for i, t in enumerate(self.id_to_term)}

    @classmethod
    def build(cls, tokenized_corpus: Iterable[List[str]]) -> "Vocabulary":
        seen = set()
        for tokens in tokenized_corpus:
            seen.update(tokens)
        return cls(sorted(seen))

    def __len__(self) -> int:
        return len(self.id_to_term)

    def encode(self, tokens: List[str], drop_oov: bool = True) -> List[int]:
        ids = []
        for t in tokens:
            i = self.term_to_id.get(t)
            if i is not None:
                ids.append(i)
            elif not drop_oov:
                ids.append(-1)
        return ids

    def encode_counts(self, tokens: List[str]) -> Counter:
        """Term-id → multiplicity for the in-vocabulary tokens."""
        c: Counter = Counter()
        for t in tokens:
            i = self.term_to_id.get(t)
            if i is not None:
                c[i] += 1
        return c

    def to_arrays(self) -> np.ndarray:
        return np.array(self.id_to_term, dtype=object)
