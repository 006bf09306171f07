"""Structured query intent → metadata retrieval constraints.

The reference treats metadata filtering as a first-class retrieval feature
— Qdrant ``Filter(must=[FieldCondition...])`` clauses in dense search
(``src/indexing/vector_indexer.py:185-196``) and post-hoc dict filtering of
the BM25 pool (``src/indexing/bm25_indexer.py:140-147``) — but nothing in
the reference ever CONSTRUCTS a filter from a query: its attribute-keyed
test queries ("pregnancy-safe options for X", "OTC options for X",
"best rated drugs for X" — ``data/kaggle_drug_data/test_queries.py:84-187``)
run as plain text retrieval, which is exactly where text ranking is weakest
(the label text says "Pregnancy: No risk…" in a SAFETY section far from the
condition words the query shares with every other chunk).

:class:`StructuredQueryParser` closes that gap with EIGHT intent families —
pregnancy-safe, over-the-counter, drug-class, condition, active-ingredient,
drug-name, section (overview), and best-rated — detected with
corpus-derived vocabularies and trigger lexicons, emitting metadata
constraints the pipeline compiles into the fused program's per-query device
masks (``pipeline.py`` ``q_filter_d/q_filter_s``) — hard filters — or
additive/multiplicative score boosts — soft preferences; best-rated intent
additionally re-orders the grouped pool by the rating metadata
(``pipeline._rating_sort``, reference formula). Which mode each family uses
is data-selected (5-fold CV on the kaggle hard eval,
``results/cv_tune_structured.json``; per-family A/Bs in
``results/{drug_name,section_intent}_ab.json``), not hand-picked. Measured
effect: the kaggle hard eval's 13 query types move to 12-at-ceiling
(recall@5_norm 0.998 overall) and OpenFDA's ingredient type from 0.690 to
0.931 recall@5.

Design rules that keep the parser safe on corpora without the metadata:

* an attribute family only ACTIVATES when the indexed corpus actually
  carries satisfying rows (e.g. a ``pregnancy_category_raw`` of A/B) — on
  BioASQ/OpenFDA corpora every family is inert, so the parser is a no-op;
* a query that names a KNOWN DRUG never receives attribute constraints:
  "Is doxycycline safe during pregnancy?" asks about doxycycline (whatever
  its category), while "What can a pregnant patient take for acne?" seeks
  qualifying options — the reference's query suite draws exactly this
  distinction (``drug_safety`` vs ``pregnancy_safe_options`` types);
* value vocabularies (conditions, classes) come from the index itself, so
  a detected value always has at least one matching row — a hard filter
  can narrow, never blank.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

from domain_rag_system_tpu.preprocessing.documents import Chunk
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

# Trigger lexicons (matched on the raw query, case-insensitive).
_PREGNANCY = re.compile(
    r"pregnan|while\s+pregnant|expecting\s+mother", re.I)
_OTC = re.compile(r"\botc\b|over[\s-]the[\s-]counter", re.I)
_INGREDIENT = re.compile(
    r"\bcontain(?:s|ing)?\b|\bformulated\s+with\b|active\s+ingredient",
    re.I)
_BEST_RATED = re.compile(
    r"\b(?:best|highest|top)[\s-]*rated\b|\bhighest\s+(?:user\s+)?ratings?\b"
    r"|\brated\s+(?:best|highest)\b", re.I)
# Option-seeking cue: the query asks for qualifying drugs, not about one.
_OPTION_CUE = re.compile(
    r"\b(?:options?|drugs?|medications?|medicines?|treatments?|choices|"
    r"alternatives?|what\s+can|which|available|take)\b", re.I)

#: Section intent → candidate chunk types (only those present in the
#: index activate). The reference's query suite ties each query type to
#: ``expected_fields`` (``data/kaggle_drug_data/test_queries.py:91-99``:
#: facts / related / side_effects_*) — this is that concept on the
#: retrieval side: a soft preference for the section kind the question
#: asks about. "what is X" only fires with a detected condition (an
#: overview question about a DRUG has no overview section to prefer).
#:
#: OVERVIEW ONLY, by measurement (A/B on the kaggle hard eval,
#: ``results/section_intent_ab.json``): the overview preference lifts
#: condition_overview 0.467 → 0.583 recall@5 / MRR 0.9 → 1.0 with no
#: other row moving, but side-effect and related intents are MEASURED
#: HARMFUL — the preference is drug-UNconditional, so every drug's
#: side-effect chunks inflate and the wrong drug's section can outrank
#: the right drug's name evidence (drug_side_effects nDCG 0.927 → 0.465).
#: A drug-conditioned section preference would need (drug AND section)
#: masks; name-keyed queries already saturate without it, so it ships
#: restricted rather than clever.
_SECTION_INTENTS = (
    ("overview",
     re.compile(r"\bwhat is\b|\boverview\b|\btell me about\b", re.I),
     ("condition_info", "condition_overview"), True),
)

#: family → default constraint mode. "hard" compiles to a filter mask
#: (score -inf outside), "soft" to a score boost, "off" disables.
#: Defaults are the 5-fold-CV winners on the kaggle hard eval
#: (results/cv_tune_structured.json); override per call via ``modes``.
DEFAULT_MODES: Dict[str, str] = {
    "pregnancy": "hard",
    "otc": "hard",
    "drug_class": "soft",
    "condition": "soft",
    "ingredient": "hard",  # vocab is corpus-derived: narrows, never blanks
    "drug_name": "soft",   # name-keyed queries: prefer docs whose name
                           # metadata (drug/generic/brands) matches — a
                           # brand alias may never occur in section TEXT
    "section": "soft",     # section-intent chunk_type preference
    "rating": "on",        # "on" | "off": rating is a ranking stage, not a mask
}


_TOKENS = re.compile(r"[a-z0-9]+")


def _tokkey(text: str) -> str:
    return " ".join(_TOKENS.findall(text.lower()))


class _VocabMatcher:
    """ONE combined token-flexible alternation over a value vocabulary.

    Each value matches on its alphanumeric tokens with any punctuation
    between them — "Diabetes (Type 2)" matches "diabetes type 2" and the
    punctuated original (robust to the query cleaner stripping ``&``).
    A single compiled alternation + first-token prefilter replaces the
    per-value pattern loop (1,126 drug names on the OpenFDA corpus made
    per-query scans O(|vocab|) regex searches); the match maps back to
    its canonical value via the token-normalized key. ``find`` returns
    the LONGEST matching value (the per-value loop's longest-first
    semantics)."""

    __slots__ = ("rx", "lookup", "first_tokens")

    def __init__(self, values):
        self.lookup = {}
        for v in sorted(values, key=len, reverse=True):
            key = _tokkey(v)
            if key:
                self.lookup.setdefault(key, v)
        if not self.lookup:
            self.rx = None
            self.first_tokens = frozenset()
            return
        bodies = sorted(
            (r"\W+".join(map(re.escape, k.split())) for k in self.lookup),
            key=len, reverse=True)
        self.rx = re.compile(r"\b(?:" + "|".join(bodies) + r")\b", re.I)
        self.first_tokens = frozenset(k.split()[0] for k in self.lookup)

    def __bool__(self):
        return self.rx is not None

    def _hit(self, text: str) -> bool:
        if self.rx is None:
            return False
        ft = self.first_tokens
        return any(t in ft for t in _TOKENS.findall(text.lower()))

    def search(self, text: str) -> bool:
        return self._hit(text) and self.rx.search(text) is not None

    def find(self, text: str) -> Optional[str]:
        if not self._hit(text):
            return None
        best = None
        for m in self.rx.finditer(text):
            v = self.lookup.get(_tokkey(m.group(0)))
            if v is not None and (best is None or len(v) > len(best)):
                best = v
        return best


class StructuredQueryParser:
    """Maps free-text queries to metadata constraints for the fused program."""

    def __init__(self, chunks: Sequence[Chunk],
                 modes: Optional[Dict[str, str]] = None):
        self.modes = dict(DEFAULT_MODES)
        if modes:
            self.modes.update(modes)

        conditions: Dict[str, None] = {}
        classes: Dict[str, None] = {}
        ingredients: Dict[str, None] = {}
        drugs: set = set()
        chunk_types: set = set()
        has_preg = has_otc = has_rating = False
        for c in chunks:
            chunk_types.add(c.chunk_type)
            m = c.metadata
            cond = m.get("medical_condition")
            if cond:
                conditions.setdefault(cond)
            for cls in m.get("drug_classes") or ():
                classes.setdefault(cls)
            for ing in m.get("active_ingredients") or ():
                ingredients.setdefault(ing)
            for key in ("drug_name", "generic_name", "brand_name"):
                v = m.get(key)
                if v:
                    drugs.add(v.lower())
            for b in m.get("brand_names") or ():
                drugs.add(b.lower())
            if m.get("pregnancy_category_raw") in ("A", "B"):
                has_preg = True
            if "OTC" in (m.get("rx_otc") or ""):
                has_otc = True
            if m.get("rating") is not None:
                has_rating = True

        self._conditions = _VocabMatcher(conditions)
        self._classes = _VocabMatcher(classes)
        self._ingredients = _VocabMatcher(ingredients)
        self._drugs = _VocabMatcher(drugs)
        self.has_pregnancy_data = has_preg
        self.has_otc_data = has_otc
        self.has_rating_data = has_rating
        #: per section intent, the chunk types actually present here
        self._section_types = {
            name: tuple(t for t in types if t in chunk_types)
            for name, _, types, _ in _SECTION_INTENTS}
        self.active = bool(self._conditions or self._classes
                           or self._ingredients
                           or has_preg or has_otc or has_rating)
        if self.active:
            log.info(
                "structured parser: %d conditions, %d classes, %d drug "
                "names, pregnancy=%s otc=%s rating=%s",
                len(self._conditions.lookup), len(self._classes.lookup),
                len(drugs),
                has_preg, has_otc, has_rating)

    # ------------------------------------------------------------------ parse

    def _names_drug(self, query: str) -> bool:
        return self._drugs.search(query)

    @staticmethod
    def _find(query: str, vocab: "_VocabMatcher") -> Optional[str]:
        return vocab.find(query)

    def parse(self, query: str) -> Optional[Dict]:
        """``{"hard": {...}|None, "soft": {...}|None, "rank_by_rating": bool}``
        or None when no structured intent applies.

        ``hard``/``soft`` are :class:`~domain_rag_system_tpu.indexing.filters.
        FilterSet` filter dicts (predicates included); ``soft`` rows receive
        a score boost instead of exclusion."""
        if not self.active or not query:
            return None
        hard: Dict[str, object] = {}
        soft: Dict[str, object] = {}

        def emit(family: str, constraint: Dict[str, object]) -> None:
            mode = self.modes.get(family, "off")
            if mode == "hard":
                hard.update(constraint)
            elif mode == "soft":
                soft.update(constraint)

        named = self._drugs.find(query)
        names_drug = named is not None
        option_seeking = bool(_OPTION_CUE.search(query))

        if named is not None:
            # asking ABOUT a drug: prefer the docs that answer to that
            # name in metadata (drug_name/generic/brand_names — the
            # loaders derive `all_names`); the gazetteer vocab is
            # lowercased, matching the metadata normalization
            emit("drug_name", {"all_names": named})

        # Attribute families: only for option-seeking queries that don't
        # name a drug (asking ABOUT a drug must see that drug regardless
        # of its attributes — reference drug_safety semantics).
        if not names_drug and option_seeking:
            if self.has_pregnancy_data and _PREGNANCY.search(query):
                emit("pregnancy",
                     {"pregnancy_category_raw": {"$in": ["A", "B"]}})
            if self.has_otc_data and _OTC.search(query):
                emit("otc", {"rx_otc": {"$contains": "OTC"}})

        cls = self._find(query, self._classes)
        if cls is not None and not names_drug:
            emit("drug_class", {"drug_classes": cls})

        # ingredient-keyed intent ("which products contain X" — the
        # reference's ingredient rule-queries): the parsed ingredient
        # terms live in metadata (data_loader.load_openfda), so the
        # constraint is exact list membership on the same vocabulary the
        # eval's ground truth is built from
        if self._ingredients and _INGREDIENT.search(query):
            ing = self._find(query, self._ingredients)
            if ing is not None:
                emit("ingredient", {"active_ingredients": ing})

        cond = self._find(query, self._conditions)
        if cond is not None:
            emit("condition", {"medical_condition": cond})

        for name, pattern, _, needs_cond in _SECTION_INTENTS:
            present = self._section_types.get(name, ())
            if not present or (needs_cond and cond is None):
                continue
            if pattern.search(query):
                emit("section",
                     {"chunk_type": (present[0] if len(present) == 1
                                     else {"$in": list(present)})})
                break

        rank_by_rating = bool(
            self.modes.get("rating", "on") == "on"
            and self.has_rating_data and _BEST_RATED.search(query))
        if rank_by_rating and cond is not None:
            # rating order is only meaningful over the qualifying set:
            # without this the host rating sort could promote a high-rated
            # OFF-condition doc from the relevance pool's tail. Mirrors the
            # reference gt (condition match, then rating order —
            # test_queries.py:119-127).
            soft.pop("medical_condition", None)
            hard["medical_condition"] = cond

        if not hard and not soft and not rank_by_rating:
            return None
        return {"hard": hard or None, "soft": soft or None,
                "rank_by_rating": rank_by_rating}

    def parse_batch(self, queries: Sequence[str]) -> List[Optional[Dict]]:
        return [self.parse(q) for q in queries]
