"""Hybrid retrieval end-to-end on the toy corpus."""

import numpy as np
import pytest

from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.models import MedicalEmbedder


@pytest.fixture
def hybrid(toy_chunks):
    h = HybridIndex(
        dense_index=DenseIndex(MedicalEmbedder(dim=512), row_block=8),
        bm25_index=BM25Index(),
    )
    h.index_chunks(toy_chunks)
    return h


def test_hybrid_rrf_search(hybrid):
    results = hybrid.search("treatment for type 2 diabetes", top_k=5)
    assert len(results) == 5
    assert results[0]["fusion_method"] == "rrf"
    # metformin chunk is the top lexical+dense match
    assert results[0]["chunk_id"] == "doc2_body"
    scores = [r["score"] for r in results]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_weighted_search(hybrid):
    results = hybrid.search("blood pressure drug", top_k=5,
                            fusion_method="weighted",
                            vector_weight=0.7, bm25_weight=0.3)
    assert results
    assert results[0]["fusion_method"] == "weighted"


def test_hybrid_deduplicates(hybrid):
    results = hybrid.search("diabetes", top_k=10)
    ids = [r["chunk_id"] for r in results]
    assert len(ids) == len(set(ids))


def test_hybrid_overlap_beats_single_list(hybrid, toy_chunks):
    """A chunk found by both retrievers should outrank single-list hits of
    similar rank."""
    results = hybrid.search("insulin for diabetes", top_k=4)
    top_texts = [r["text"] for r in results[:2]]
    assert any("insulin" in t for t in top_texts)


def test_hybrid_filters(hybrid):
    results = hybrid.search("pain", top_k=6, filters={"source_tag": "even"})
    assert results
    assert all(r["metadata"]["source_tag"] == "even" for r in results)


def test_hybrid_dense_only_and_sparse_only(toy_chunks):
    dense_only = HybridIndex(
        dense_index=DenseIndex(MedicalEmbedder(dim=256), row_block=8))
    dense_only.index_chunks(toy_chunks)
    r = dense_only.search("cholesterol", top_k=3)
    assert r and r[0]["fusion_method"] == "rrf"

    sparse_only = HybridIndex(bm25_index=BM25Index())
    sparse_only.index_chunks(toy_chunks)
    r = sparse_only.search("cholesterol", top_k=3)
    assert r
    assert r[0]["chunk_id"] == "doc5_body"


def test_filter_value_type_errors_are_clear():
    """Unhashable filter values (e.g. nested dicts) must raise a clear
    ValueError instead of an opaque TypeError from the cache key."""
    import pytest

    from domain_rag_system_tpu.indexing.filters import FilterSet
    from domain_rag_system_tpu.preprocessing import Chunk

    fs = FilterSet([Chunk(chunk_id="c0", doc_id="d0", source="pubmed",
                          chunk_type="abstract", text="x", metadata={})])
    with pytest.raises(ValueError, match="hashable scalars"):
        fs.mask({"metadata": {"year": 2020}})
    # scalar filters still work
    assert fs.mask({"source": "pubmed"}).tolist() == [1]
    assert fs.mask({"source": "openfda"}).tolist() == [0]
