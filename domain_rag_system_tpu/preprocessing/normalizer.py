"""Medical terminology normalization.

Functional parity with the reference ``MedicalTermNormalizer``
(``src/preprocessing/medical_term_normalizer.py:8-296``): abbreviation
expansion, brand→``generic (brand)`` rewriting, condition-synonym
standardization, medical-term extraction, synonym lookup, and building the
generic→brands drug mapping from OpenFDA/Kaggle document metadata
(``build_drug_mapping_from_data``, ``:232-267``).

Engineering differences from the reference:
  * the terminology tables live in ``resources/medical_terms.json`` (data,
    not code) and can be overridden per deployment;
  * each rewrite pass compiles ONE alternation regex instead of running a
    ``re.sub`` per dictionary entry (the reference does ~35 full-text regex
    passes per call at ``:126-137``) — O(text) instead of O(text·|dict|);
  * compiled patterns are cached and invalidated when the drug mapping is
    replaced.
"""

from __future__ import annotations

import json
import re
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Set

from domain_rag_system_tpu.preprocessing.documents import Document
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

_RESOURCE_PATH = Path(__file__).resolve().parent.parent / "resources" / "medical_terms.json"


def _load_tables(path: Optional[Path] = None) -> Dict:
    with open(path or _RESOURCE_PATH, "r", encoding="utf-8") as f:
        return json.load(f)


_WORD_RE = re.compile(r"\w+")


class GuardedPattern:
    """Compiled alternation + first-word prefilter.

    A 400-entry alternation costs ~40–120 µs per scan in Python's
    backtracking engine even on a short query, and most queries contain
    no table entry at all. Any `\\b`-anchored match implies the entry's
    first ``\\w+`` chunk appears as a maximal word run in the text, so an
    O(words) set check against the entries' first words safely skips the
    regex in the common no-hit case (never a false negative).

    Comparison uses ``str.casefold()`` on both sides — ``re.IGNORECASE``
    matches some non-ASCII case pairs (dotted/dotless I, 'ẞ') that plain
    ``.lower()`` misses, and a prefilter miss there would silently skip a
    substitution the regex would have made."""

    __slots__ = ("rx", "first_words")

    def __init__(self, rx: re.Pattern, terms: Iterable[str]):
        self.rx = rx
        self.first_words = set()
        for t in terms:
            m = _WORD_RE.search(t)
            if m:
                self.first_words.add(m.group(0).casefold())

    def _hit(self, text: str) -> bool:
        fw = self.first_words
        return any(w.casefold() in fw for w in _WORD_RE.findall(text))

    def sub(self, repl, text: str) -> str:
        return self.rx.sub(repl, text) if self._hit(text) else text

    def finditer(self, text: str):
        return self.rx.finditer(text) if self._hit(text) else iter(())


def _trie_body(terms: List[str]) -> str:
    """Serialize ``terms`` as a prefix-trie regex.

    Python's regex engine tries a flat alternation's branches one by one at
    every position — O(|terms|) per character for the 2k-entry mined drug
    table. A trie shares prefixes, so matching is O(trie depth), and the
    first-char branches are disjoint. Longest-match semantics (the flat
    longest-first alternation's behavior) are preserved structurally:
    within a branch the continuation is always tried before accepting a
    terminal (the empty alternative serializes LAST).
    """
    trie: Dict = {}
    for t in terms:
        node = trie
        for ch in t.lower():
            node = node.setdefault(ch, {})
        node[""] = None  # terminal marker

    def serialize(node: Dict) -> str:
        terminal = "" in node
        alts: List[str] = []     # branches with continuations
        chars: List[str] = []    # single-char leaf branches
        for ch in sorted(k for k in node if k != ""):
            child = node[ch]
            if len(child) == 1 and "" in child:
                chars.append(re.escape(ch))
            else:
                alts.append(re.escape(ch) + serialize(child))
        if chars:
            alts.append(chars[0] if len(chars) == 1
                        else "[" + "".join(chars) + "]")
        body = alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"
        if terminal:
            # optional continuation, preferring the longer match
            return body + "?" if len(alts) == 1 and len(body) <= 2 \
                else "(?:" + body + ")?"
        return body

    return serialize(trie)


def _alternation(terms: Iterable[str]) -> Optional[GuardedPattern]:
    """Compile one case-insensitive word-boundary alternation over ``terms``
    as a prefix-trie regex; longer entries win over their prefixes (the
    trie tries continuations before terminals)."""
    terms = sorted({t for t in terms if t}, key=len, reverse=True)
    if not terms:
        return None
    rx = re.compile(r"\b" + _trie_body(terms) + r"\b", re.IGNORECASE)
    return GuardedPattern(rx, terms)


class MedicalTermNormalizer:
    """Rewrites medical text to a canonical vocabulary."""

    def __init__(
        self,
        abbreviations_path: Optional[str] = None,
        drug_mapping_path: Optional[str] = None,
        resources_path: Optional[str] = None,
    ):
        tables = _load_tables(Path(resources_path) if resources_path else None)

        if abbreviations_path and Path(abbreviations_path).exists():
            with open(abbreviations_path, "r", encoding="utf-8") as f:
                self.abbreviations: Dict[str, str] = json.load(f)
        else:
            self.abbreviations = dict(tables["abbreviations"])

        self.condition_synonyms: Dict[str, List[str]] = dict(tables["condition_synonyms"])
        self.medical_stopwords: Set[str] = set(tables["medical_stopwords"])

        self._drug_mapping: Dict[str, List[str]] = {}
        if drug_mapping_path and Path(drug_mapping_path).exists():
            with open(drug_mapping_path, "r", encoding="utf-8") as f:
                self._drug_mapping = json.load(f)

        self._compile()

    # ------------------------------------------------------------ properties

    @property
    def drug_mapping(self) -> Dict[str, List[str]]:
        return self._drug_mapping

    @drug_mapping.setter
    def drug_mapping(self, mapping: Dict[str, List[str]]) -> None:
        self._drug_mapping = mapping
        self._compile_drugs()

    # ------------------------------------------------------------ compile

    def _compile(self) -> None:
        # version counter lets consumers (QueryPreprocessor) cache their own
        # derived patterns and invalidate when the tables change
        self.version = getattr(self, "version", 0) + 1
        # Abbreviation pattern + lowercase lookup for replacements.
        self._abbr_pattern = _alternation(self.abbreviations)
        self._abbr_lookup = {k.lower(): v for k, v in self.abbreviations.items()}
        self._abbr_canon = {k.lower(): k for k in self.abbreviations}

        # Condition synonym → standard name. The standard names map to
        # themselves: with longest-first matching this shields synonyms that
        # are substrings of an already-standard phrase (the reference rewrites
        # "diabetes" inside "type 2 diabetes mellitus" to produce
        # "... mellitus mellitus", medical_term_normalizer.py:153-161 — fixed
        # here deliberately).
        self._cond_lookup: Dict[str, str] = {}
        for standard, synonyms in self.condition_synonyms.items():
            self._cond_lookup[standard.lower()] = standard
            for syn in synonyms:
                self._cond_lookup[syn.lower()] = standard
        self._cond_pattern = _alternation(self._cond_lookup)

        self._compile_drugs()

    def _compile_drugs(self) -> None:
        self.version = getattr(self, "version", 0) + 1
        # Brand (lowercased) → generic.
        self._brand_lookup: Dict[str, str] = {}
        for generic, brands in self._drug_mapping.items():
            for brand in brands:
                self._brand_lookup[brand.lower()] = generic
        self._brand_pattern = _alternation(self._brand_lookup)

    # ------------------------------------------------------------ normalize

    def normalize_text(self, text: str, expand_abbreviations: bool = True) -> str:
        if not text:
            return text
        if expand_abbreviations:
            text = self._expand_abbreviations(text)
        text = self._normalize_drug_names(text)
        text = self._normalize_conditions(text)
        return text

    def _expand_abbreviations(self, text: str) -> str:
        if self._abbr_pattern is None:
            return text
        return self._abbr_pattern.sub(
            lambda m: self._abbr_lookup[m.group(0).lower()], text
        )

    def _normalize_drug_names(self, text: str) -> str:
        """Rewrite brand names as ``generic (Brand)`` (reference ``:139-151``)."""
        if self._brand_pattern is None:
            return text
        return self._brand_pattern.sub(
            lambda m: f"{self._brand_lookup[m.group(0).lower()]} ({m.group(0)})", text
        )

    def _normalize_conditions(self, text: str) -> str:
        if self._cond_pattern is None:
            return text
        return self._cond_pattern.sub(
            lambda m: self._cond_lookup[m.group(0).lower()], text
        )

    # ------------------------------------------------------------ extraction

    def extract_medical_terms(self, text: str) -> Dict[str, List[str]]:
        """Extract drugs / conditions / abbreviations present in ``text``
        (reference ``:59-92`` — drug hits use substring semantics, abbreviation
        hits use word-boundary semantics)."""
        result: Dict[str, List[str]] = {"drugs": [], "conditions": [], "abbreviations": []}
        text_lower = text.lower()

        for generic, brands in self._drug_mapping.items():
            if generic in text_lower:
                result["drugs"].append(generic)
            for brand in brands:
                if brand.lower() in text_lower:
                    result["drugs"].append(f"{brand} ({generic})")

        if self._abbr_pattern is not None:
            seen = set()
            for m in self._abbr_pattern.finditer(text):
                key = m.group(0).lower()
                if key not in seen:
                    seen.add(key)
                    # report the table's canonical casing (reference schema)
                    result["abbreviations"].append(self._abbr_canon[key])

        return result

    def get_synonyms(self, term: str) -> List[str]:
        """All synonyms for a term across drug / condition / abbreviation
        tables (reference ``:94-123``)."""
        term_lower = term.lower()
        synonyms: Set[str] = set()

        if term_lower in self._drug_mapping:
            synonyms.update(self._drug_mapping[term_lower])
        for generic, brands in self._drug_mapping.items():
            if term_lower in (b.lower() for b in brands):
                synonyms.add(generic)
                synonyms.update(brands)

        for condition, syns in self.condition_synonyms.items():
            pool = [condition.lower()] + [s.lower() for s in syns]
            if term_lower in pool:
                synonyms.add(condition)
                synonyms.update(syns)

        if term_lower in self._abbr_lookup:
            synonyms.add(self._abbr_lookup[term_lower])

        synonyms.discard(term)
        synonyms.discard(term_lower)
        return list(synonyms)

    # ------------------------------------------------------------ mined terms

    def extend_abbreviations(self, extra: Dict[str, str]) -> int:
        """Merge mined abbreviation pairs (curated entries win on conflict).
        Returns the number of new entries; patterns recompile once."""
        added = 0
        for short, long_form in extra.items():
            if short not in self.abbreviations and short.lower() not in (
                    k.lower() for k in self.abbreviations):
                self.abbreviations[short] = long_form
                added += 1
        if added:
            self._compile()
            log.info("extended abbreviation table: +%d mined entries (%d total)",
                     added, len(self.abbreviations))
        return added

    def mine_terms_from_texts(self, texts: Iterable[str],
                              min_count: int = 1) -> int:
        """Mine abbreviation pairs from corpus texts (Schwartz–Hearst,
        preprocessing/term_mining.py) and merge them into the live table —
        the open-vocabulary replacement for the reference's SciSpacy NER +
        fixed dictionary (``query_preprocessor.py:105-127``)."""
        from domain_rag_system_tpu.preprocessing.term_mining import (
            mine_abbreviations,
        )

        mined = mine_abbreviations(texts, min_count=min_count)
        return self.extend_abbreviations(mined)

    # ------------------------------------------------------------ drug map

    def build_drug_mapping_from_data(self, documents: List[Document]) -> None:
        """Derive generic→brand mapping from OpenFDA/Kaggle metadata
        (reference ``:232-267``)."""
        drug_map: Dict[str, Set[str]] = defaultdict(set)
        for doc in documents:
            if doc.source == "openfda":
                generic = doc.metadata.get("generic_name", "").lower().strip()
                brand = doc.metadata.get("brand_name", "").strip()
                if generic and brand:
                    drug_map[generic].add(brand)
            elif doc.source == "kaggle":
                generic = doc.metadata.get("generic_name", "").lower().strip()
                drug_name = doc.metadata.get("drug_name", "").strip()
                brand_names = doc.metadata.get("brand_names", [])
                if generic and drug_name and generic != drug_name.lower():
                    drug_map[generic].add(drug_name)
                if generic and brand_names:
                    for brand in brand_names:
                        if brand.lower() != generic:
                            drug_map[generic].add(brand)
        self.drug_mapping = {k: sorted(v) for k, v in drug_map.items() if v}
        log.info("built drug mapping: %d generic drugs", len(self._drug_mapping))

    def save_drug_mapping(self, filepath: str) -> None:
        with open(filepath, "w", encoding="utf-8") as f:
            json.dump(self._drug_mapping, f, indent=2, ensure_ascii=False)
        log.info("saved drug mapping to %s", filepath)

    def load_drug_mapping(self, filepath: str) -> None:
        with open(filepath, "r", encoding="utf-8") as f:
            self.drug_mapping = json.load(f)
