"""Query preprocessing pipeline: clean → extract entities → normalize.

Functional parity with the reference ``QueryPreprocessor``
(``src/preprocessing/query_preprocessor.py:8-147``): the same result schema
(``original/cleaned/normalized/entities/medical_terms``), the same cleaning
regexes (``:88-103``) and the same normalization path.

The reference's entity extractor is SciSpacy NER with an optional UMLS
linker (``:105-127``). SciSpacy is a CPU-bound spaCy model that does not
belong in a TPU serving path; here entity extraction is a deterministic
gazetteer over the normalizer's terminology tables (drugs, conditions,
abbreviations). The extractor is pluggable: pass ``entity_extractor=`` to
substitute a model-based NER when one is available.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional

from domain_rag_system_tpu.preprocessing.normalizer import MedicalTermNormalizer

_WHITESPACE = re.compile(r"\s+")
# Keep alphanumerics, spaces, and medical-relevant punctuation (reference :99).
_SPECIALS = re.compile(r"[^\w\s\-\+/().,?]")

# Generic English stopwords for keyword extraction (the reference delegates
# this to spaCy's `token.is_stop`, query_preprocessor.py:139-145).
_STOPWORDS = {
    "a", "an", "the", "and", "or", "but", "if", "then", "than", "that",
    "this", "these", "those", "is", "are", "was", "were", "be", "been",
    "being", "am", "do", "does", "did", "have", "has", "had", "will",
    "would", "can", "could", "shall", "should", "may", "might", "must",
    "of", "in", "on", "at", "to", "for", "from", "by", "with", "about",
    "as", "into", "through", "during", "before", "after", "between",
    "out", "over", "under", "up", "down", "off", "above", "below",
    "it", "its", "he", "she", "they", "them", "his", "her", "their",
    "we", "you", "your", "i", "me", "my", "not", "no", "nor", "so",
    "too", "very", "just", "both", "each", "few", "more", "most",
    "other", "some", "such", "only", "own", "same", "what", "which",
    "who", "whom", "when", "where", "why", "how", "all", "any", "there",
    "here", "also", "used", "use", "using",
}


class QueryPreprocessor:
    """Cleans, annotates and normalizes user queries before retrieval."""

    def __init__(
        self,
        medical_normalizer: Optional[MedicalTermNormalizer] = None,
        entity_extractor: Optional[Callable[[str], List[Dict]]] = None,
    ):
        self.normalizer = medical_normalizer or MedicalTermNormalizer()
        self._entity_extractor = entity_extractor

    def preprocess(
        self,
        query: str,
        extract_entities: bool = True,
        normalize_terms: bool = True,
        expand_abbreviations: bool = True,
        annotate: bool = True,
    ) -> Dict:
        """``annotate=False`` skips the entity/medical-term annotation scans
        (~70% of preprocess cost at mined-table sizes) and returns empty
        ``entities``/``medical_terms`` — the retrieval inputs (``cleaned``,
        ``normalized``) are unaffected. The serving/eval batch path uses
        this (annotations feed nothing downstream there — reference parity:
        its scripts only print them, ``scripts/query.py:130-136``); the
        single-query CLI keeps full annotation."""
        result: Dict = {
            "original": query,
            "cleaned": "",
            "normalized": "",
            "entities": [],
            "medical_terms": {},
        }

        cleaned = self.clean_query(query)
        result["cleaned"] = cleaned

        if extract_entities and annotate:
            result["entities"] = self.extract_entities(cleaned)

        if normalize_terms:
            result["normalized"] = self.normalizer.normalize_text(
                cleaned, expand_abbreviations=expand_abbreviations
            )
            if annotate:
                result["medical_terms"] = \
                    self.normalizer.extract_medical_terms(cleaned)
        else:
            result["normalized"] = cleaned

        return result

    def select_search_query(self, preprocessed: Dict) -> str:
        """Choose the retrieval query string from a preprocess() result.

        Reference policy (``scripts/query.py:134-136``): prefer the cleaned
        query; switch to the normalized one only if the normalization did not
        more than double its length (abbreviation expansion can balloon text).
        """
        search_query = preprocessed.get("cleaned") or preprocessed.get("original", "")
        normalized = preprocessed.get("normalized")
        if normalized and len(normalized) < len(search_query) * 2:
            search_query = normalized
        return search_query

    def clean_query(self, query: str) -> str:
        if not query:
            return ""
        cleaned = _WHITESPACE.sub(" ", query)
        cleaned = _SPECIALS.sub("", cleaned)
        return cleaned.strip()

    def extract_entities(self, text: str) -> List[Dict]:
        """Entity spans found in ``text``.

        Default extractor: gazetteer over the normalizer's drug / condition /
        abbreviation tables, emitting the same span schema as the reference
        (``text``, ``label``, ``start``, ``end``).
        """
        if self._entity_extractor is not None:
            return self._entity_extractor(text)

        entities: List[Dict] = []
        seen_spans = set()

        def scan(pattern: "re.Pattern | None", lookup: Dict[str, str]) -> None:
            if pattern is None:
                return
            for m in pattern.finditer(text):
                span = (m.start(), m.end())
                if any(s <= span[0] < e or s < span[1] <= e for s, e in seen_spans):
                    continue
                seen_spans.add(span)
                entities.append({
                    "text": m.group(0),
                    "label": lookup[m.group(0).lower()],
                    "start": m.start(),
                    "end": m.end(),
                })

        for pattern, lookup in self._gazetteer_patterns():
            scan(pattern, lookup)
        entities.sort(key=lambda e: e["start"])
        return entities

    def _gazetteer_patterns(self):
        """Compiled single-alternation gazetteer patterns, cached against the
        normalizer's table version (one regex pass per table instead of one
        scan per term — at 400+ mined abbreviations the per-term loop
        dominated query preprocessing)."""
        norm = self.normalizer
        version = getattr(norm, "version", 0)
        cached = getattr(self, "_gazetteer_cache", None)
        if cached is not None and cached[0] == version:
            return cached[1]

        # prefiltered compiled alternation (normalizer.GuardedPattern):
        # the no-hit case is an O(words) set check, not a regex scan
        from domain_rag_system_tpu.preprocessing.normalizer import (
            _alternation as alternation,
        )

        drug_terms: Dict[str, str] = {}
        for generic, brands in norm.drug_mapping.items():
            drug_terms[generic.lower()] = "DRUG"
            for b in brands:
                drug_terms[b.lower()] = "DRUG"
        cond_terms: Dict[str, str] = {}
        for standard, syns in norm.condition_synonyms.items():
            cond_terms[standard.lower()] = "CONDITION"
            for s in syns:
                cond_terms[s.lower()] = "CONDITION"
        abbr_terms = {a.lower(): "ABBREVIATION" for a in norm.abbreviations}

        patterns = [(alternation(t), t)
                    for t in (drug_terms, cond_terms, abbr_terms)]
        self._gazetteer_cache = (version, patterns)
        return patterns

    def get_query_keywords(self, query: str) -> List[str]:
        """Important keywords: stopwords removed, medical terms protected
        (reference ``:129-147``)."""
        tokens = re.findall(r"[A-Za-z]+", query)
        keywords = []
        for token in tokens:
            lower = token.lower()
            if lower not in _STOPWORDS or lower in self.normalizer.medical_stopwords:
                keywords.append(lower)
        return keywords
