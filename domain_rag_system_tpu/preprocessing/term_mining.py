"""Corpus-driven synonym / abbreviation mining.

The reference relies on SciSpacy NER + a hardcoded ~35-entry abbreviation
dictionary (``src/preprocessing/medical_term_normalizer.py:163-218`` and
``query_preprocessor.py:105-127``). This module widens that coverage
*offline and deterministically* by mining the corpora themselves:

  * **Abbreviation pairs** via the Schwartz–Hearst long-form/(short-form)
    pattern — "myocardial infarction (MI)" — the standard biomedical
    abbreviation-extraction algorithm (pattern matching only, no models);
  * **Alias pairs** via explicit apposition markers — "X, also known as Y",
    "X (also called Y)".

The mined table feeds two consumers:
  1. the :class:`MedicalTermNormalizer` / :class:`QueryPreprocessor` at
     serving time (open-vocabulary expansion instead of the fixed dict);
  2. training-time query augmentation for the dense encoder
     (``scripts/train_encoder.py --pair_style semantic``) — queries are
     rewritten with mined variants so the encoder must align *different
     surface forms* of the same concept (the semantic signal BM25 lacks).
"""

from __future__ import annotations

import json
import re
from collections import Counter
from typing import Dict, Iterable, List, Optional, Tuple

_PAREN = re.compile(r"\(([^()]{1,60})\)")
_WORD = re.compile(r"[A-Za-z0-9][A-Za-z0-9'-]*")
_AKA = re.compile(
    r"\b([A-Za-z][A-Za-z0-9 '-]{2,60}?)[,]?\s*"
    r"(?:\(?also (?:known as|called|termed|referred to as)|\baka\b)\s*"
    r"[\"']?([A-Za-z][A-Za-z0-9 '-]{2,60}?)[\"']?(?=[,.;)\s]|$)",
    re.IGNORECASE,
)


def _is_short_form(token: str) -> bool:
    """Plausible abbreviation: 2-10 chars, starts alnum, has a letter,
    at most 2 words, not a plain lowercase dictionary word."""
    if not 2 <= len(token) <= 10:
        return False
    if len(token.split()) > 2:
        return False
    if not token[0].isalnum():
        return False
    letters = [c for c in token if c.isalpha()]
    if not letters:
        return False
    # require at least one uppercase letter (filters "(see text)" etc.)
    return any(c.isupper() for c in letters)


def _match_long_form(short: str, words_before: List[str]) -> Optional[str]:
    """Schwartz–Hearst candidate match: find the shortest trailing span of
    ``words_before`` whose characters contain the short form's letters in
    order, with the first letter anchored at the start of the span's first
    word. Returns the long form or None."""
    sf = [c.lower() for c in short if c.isalnum()]
    if not sf:
        return None
    max_words = min(len(sf) + 5, len(sf) * 2, len(words_before))
    for n_words in range(1, max_words + 1):
        span = words_before[len(words_before) - n_words:]
        text = " ".join(span)
        low = text.lower()
        # first char of the short form must start the span
        if not low or low[0] != sf[0]:
            continue
        i = 0
        for ch in low:
            if i < len(sf) and ch == sf[i]:
                i += 1
        if i == len(sf):
            # reject trivial self-matches ("MI (MI)")
            if low == " ".join(sf) or low == short.lower():
                return None
            return text
    return None


def mine_abbreviations(texts: Iterable[str], min_count: int = 1) -> Dict[str, str]:
    """Mine {SHORT_FORM: long form} pairs from "long form (SF)" patterns.

    ``min_count`` keeps only pairs seen at least that many times (raising it
    trades recall for precision on noisy corpora).
    """
    votes: Counter = Counter()
    for text in texts:
        for m in _PAREN.finditer(text):
            short = m.group(1).strip()
            if not _is_short_form(short):
                continue
            prefix = text[: m.start()]
            words = _WORD.findall(prefix)[-12:]
            long_form = _match_long_form(short, words)
            if long_form and len(long_form) > len(short):
                votes[(short, long_form.lower())] += 1

    # Keep the most frequent long form per short form.
    best: Dict[str, Tuple[str, int]] = {}
    for (short, long_form), count in votes.items():
        if count < min_count:
            continue
        if short not in best or count > best[short][1]:
            best[short] = (long_form, count)
    return {short: lf for short, (lf, _) in sorted(best.items())}


def mine_aliases(texts: Iterable[str], min_count: int = 1) -> Dict[str, List[str]]:
    """Mine {term: [aliases]} from "X, also known as Y" style markers."""
    votes: Counter = Counter()
    for text in texts:
        for m in _AKA.finditer(text):
            a = m.group(1).strip().lower()
            b = m.group(2).strip().lower()
            if a and b and a != b and len(a.split()) <= 6 and len(b.split()) <= 6:
                votes[(a, b)] += 1
    table: Dict[str, List[str]] = {}
    for (a, b), count in votes.items():
        if count < min_count:
            continue
        table.setdefault(a, []).append(b)
    return {k: sorted(v) for k, v in sorted(table.items())}


def mine_term_table(
    texts: Iterable[str],
    min_count: int = 1,
) -> Dict[str, Dict]:
    """Full mining pass → {"abbreviations": {...}, "aliases": {...}}."""
    texts = list(texts)
    return {
        "abbreviations": mine_abbreviations(texts, min_count=min_count),
        "aliases": mine_aliases(texts, min_count=min_count),
    }


def save_term_table(table: Dict, path) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(table, f, indent=1, ensure_ascii=False)


def load_term_table(path) -> Dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


class SynonymAugmenter:
    """Deterministic query rewriting with surface-form variants.

    Substitution sources: a mined term table (abbreviation ↔ expansion, both
    directions) plus the normalizer's curated abbreviation/condition tables.
    Used at TRAINING time to build (variant query, passage) pairs whose
    query wording differs from the passage — the supervision that teaches a
    dense encoder what BM25 cannot retrieve.
    """

    def __init__(self, tables: Optional[List[Dict[str, object]]] = None):
        # variant_map: lowercase surface form -> list of alternatives
        self.variant_map: Dict[str, List[str]] = {}
        for table in tables or []:
            for key, val in table.items():
                variants = [val] if isinstance(val, str) else list(val)
                self._add(key, variants)
                for v in variants:
                    self._add(v, [key])

    def _add(self, term: str, variants: List[str]) -> None:
        term = term.lower().strip()
        if not term:
            return
        bucket = self.variant_map.setdefault(term, [])
        for v in variants:
            v = str(v).strip()
            if v and v.lower() != term and v not in bucket:
                bucket.append(v)

    def __len__(self) -> int:
        return len(self.variant_map)

    @property
    def _pattern(self) -> Optional[re.Pattern]:
        # single alternation (longest-first so multiword terms win over
        # their substrings), compiled once — same design as the normalizer
        if getattr(self, "_compiled", None) is None and self.variant_map:
            terms = sorted(self.variant_map, key=len, reverse=True)
            self._compiled = re.compile(
                r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b",
                re.IGNORECASE)
        return getattr(self, "_compiled", None)

    def augment(self, text: str, rng, p: float = 0.5) -> Optional[str]:
        """Rewrite ``text`` by substituting known terms with variants
        (probability ``p`` per matched term). Returns None when nothing
        was substituted — callers then skip or use the original."""
        pattern = self._pattern
        if pattern is None:
            return None
        changed = [False]

        def sub(m) -> str:
            alts = self.variant_map.get(m.group(0).lower())
            if alts and rng.random() < p:
                changed[0] = True
                return alts[int(rng.integers(len(alts)))]
            return m.group(0)

        out = pattern.sub(sub, text)
        return out if changed[0] else None
