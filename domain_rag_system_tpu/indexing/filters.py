"""Metadata filters as device mask vectors.

The reference applies metadata equality filters two different ways — Qdrant
``FieldCondition`` must-clauses for dense search
(``src/indexing/vector_indexer.py:185-196``) and post-hoc dict filtering of
the BM25 top-2k pool (``src/indexing/bm25_indexer.py:140-147``), which can
silently return fewer than ``top_k`` results. Here a filter compiles to ONE
boolean mask over the corpus, applied identically inside both retrieval
paths *before* top-k — exact filtered top-k, not post-hoc truncation.

Predicate surface (the reference's Qdrant ``match`` conditions map 1:1):

* scalar value            — equality; against a LIST-valued field it means
                            membership (Qdrant's semantics for array
                            payloads with ``MatchValue``)
* ``{"$in": [v1, v2]}``   — any-of (Qdrant ``MatchAny``)
* ``{"$contains": "s"}``  — substring for string fields, membership for
                            list fields (Qdrant ``MatchText`` territory;
                            used for composite values like rx_otc
                            "Rx/OTC")

Masks are cached per canonicalized filter dict: repeated queries with the
same filter reuse the array.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from domain_rag_system_tpu.preprocessing.documents import Chunk


def _match(actual, value) -> bool:
    """One field predicate against one chunk's field value."""
    if isinstance(value, dict):
        if "$in" in value:
            allowed = value["$in"]
            if isinstance(actual, (list, tuple, set)):
                return any(a in allowed for a in actual)
            return actual in allowed
        if "$contains" in value:
            needle = value["$contains"]
            if isinstance(actual, (list, tuple, set)):
                return needle in actual
            if isinstance(actual, str):
                return needle in actual
            return False
        raise ValueError(f"unknown filter predicate {value!r} "
                         "(supported: $in, $contains)")
    if isinstance(actual, (list, tuple, set)):
        return value in actual
    return actual == value


def _canonical(filters: Dict[str, object]) -> Tuple:
    """Hashable cache key for a (possibly predicate-valued) filter dict."""
    def bad():
        return ValueError(
            "filter values must be hashable scalars (str/int/float) or "
            f"$in/$contains predicates, got {filters!r}")

    def canon_value(v):
        if isinstance(v, dict):
            if not v or any(k not in ("$in", "$contains") for k in v):
                raise bad()
            return tuple(sorted(
                (k, tuple(x) if isinstance(x, (list, tuple, set)) else x)
                for k, x in v.items()))
        return v

    try:
        key = tuple(sorted((k, canon_value(v)) for k, v in filters.items()))
        hash(key)
    except TypeError as exc:
        raise bad() from exc
    return key


class FilterSet:
    """Builds and caches corpus masks for metadata filters."""

    def __init__(self, chunks: Sequence[Chunk]):
        self._chunks = chunks
        self._cache: Dict[Tuple, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self._chunks)

    def mask(self, filters: Optional[Dict[str, object]]) -> Optional[np.ndarray]:
        """[N] uint8 mask (1 = keep) or None when no filters apply.

        Filter keys address top-level chunk fields (``source``,
        ``chunk_type``, ``doc_id``) first and fall back to ``metadata``
        entries — matching the reference's dict-get semantics over
        ``chunk.to_dict()``.
        """
        if not filters:
            return None
        key = _canonical(filters)
        cached = self._cache.get(key)
        if cached is not None:
            return cached

        mask = np.ones(len(self._chunks), dtype=np.uint8)
        for field, value in filters.items():
            for i, chunk in enumerate(self._chunks):
                if not mask[i]:
                    continue
                top = getattr(chunk, field, None)
                actual = top if top is not None else chunk.metadata.get(field)
                if not _match(actual, value):
                    mask[i] = 0
        self._cache[key] = mask
        return mask

    def any_match(self, filters: Dict[str, object]) -> bool:
        """True when at least one chunk satisfies ``filters`` — used to
        refuse hard filters that would blank the whole index (a query
        misrouted onto a corpus whose schema lacks the field)."""
        m = self.mask(filters)
        return bool(m is not None and m.any())
