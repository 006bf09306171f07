"""Metadata filters as device mask vectors.

The reference applies metadata equality filters two different ways — Qdrant
``FieldCondition`` must-clauses for dense search
(``src/indexing/vector_indexer.py:185-196``) and post-hoc dict filtering of
the BM25 top-2k pool (``src/indexing/bm25_indexer.py:140-147``), which can
silently return fewer than ``top_k`` results. Here a filter compiles to ONE
boolean mask over the corpus, applied identically inside both retrieval
paths *before* top-k — exact filtered top-k, not post-hoc truncation.

Masks are cached per (field, value): repeated queries with the same filter
reuse the device array.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from domain_rag_system_tpu.preprocessing.documents import Chunk


class FilterSet:
    """Builds and caches corpus masks for equality filters."""

    def __init__(self, chunks: Sequence[Chunk]):
        self._chunks = chunks
        self._cache: Dict[Tuple[Tuple[str, object], ...], np.ndarray] = {}

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
        try:
            key = tuple(sorted(filters.items()))
            hash(key)  # unhashable values surface here, not at cache.get
        except TypeError as exc:
            raise ValueError(
                "filter values must be hashable scalars (str/int/float), "
                f"got {filters!r}") from exc
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
                if actual != value:
                    mask[i] = 0
        self._cache[key] = mask
        return mask
