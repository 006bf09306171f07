"""Incremental index updates: add/delete chunks on live indexes."""

import numpy as np

from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.models import MedicalEmbedder
from domain_rag_system_tpu.pipeline import RetrievalPipeline
from domain_rag_system_tpu.preprocessing import Chunk


def _chunk(i, text):
    return Chunk(f"new{i}", f"newdoc{i}", "pubmed", "abstract", text,
                 {"section": "abstract"})


def test_dense_add_and_delete(toy_chunks):
    idx = DenseIndex(MedicalEmbedder(dim=256), row_block=8)
    idx.index_chunks(toy_chunks)
    assert idx.n_chunks == 12

    idx.add_chunks([_chunk(0, "zanamivir treats influenza virus infections")])
    assert idx.n_chunks == 13
    results = idx.search("zanamivir influenza", top_k=3)
    assert results[0]["chunk_id"] == "new0"

    # growth beyond capacity (12→16 padded; add 5 more → grow)
    idx.add_chunks([_chunk(i, f"filler text number {i} about nothing") for i in range(1, 6)])
    assert idx.n_chunks == 18
    assert idx.embeddings.shape[0] >= 18

    assert idx.delete_chunks(["new0"]) == 1
    results = idx.search("zanamivir influenza", top_k=3)
    assert all(r["chunk_id"] != "new0" for r in results)
    # idempotent delete
    assert idx.delete_chunks(["new0"]) == 0


def test_bm25_add_and_delete(toy_chunks):
    idx = BM25Index()
    idx.index_chunks(toy_chunks)
    n0 = idx.get_stats()["num_documents"]

    idx.add_chunks([_chunk(0, "zanamivir treats influenza virus infections")])
    results = idx.search("zanamivir influenza", top_k=3)
    assert results[0]["chunk_id"] == "new0"
    # new vocabulary terms exist
    assert "zanamivir" in idx.vocab.term_to_id

    assert idx.delete_chunks(["new0"]) == 1
    results = idx.search("zanamivir influenza", top_k=3)
    assert all(r["chunk_id"] != "new0" for r in results)
    # stats reflect the alive corpus only
    # (df of 'zanamivir' gone; avgdl recomputed)
    assert "zanamivir" not in idx.vocab.term_to_id


def test_hybrid_add_delete_through_pipeline(toy_chunks):
    emb = MedicalEmbedder(dim=256)
    h = HybridIndex(dense_index=DenseIndex(emb, row_block=8),
                    bm25_index=BM25Index())
    h.index_chunks(toy_chunks)
    p = RetrievalPipeline(h)

    new = [_chunk(0, "zanamivir treats influenza virus infections")]
    h.add_chunks_incremental(new)
    out = p.query("zanamivir for influenza", top_k=3)
    assert out["results"][0]["chunk_id"] == "new0"

    h.delete_chunks(["new0"])
    out = p.query("zanamivir for influenza", top_k=3)
    assert all(r["chunk_id"] != "new0" for r in out["results"])


def test_tombstones_never_resurface_small_corpus():
    """Regression: tombstoned BM25 rows score exactly 0 and used to stay
    ranked through fusion when top_k spans the whole corpus — both the
    hybrid host path and the fused batch program must exclude them."""
    docs = [
        _chunk(0, "aspirin reduces fever and mild pain"),
        _chunk(1, "ibuprofen is a common anti inflammatory drug"),
        _chunk(2, "metformin controls blood sugar in diabetes"),
        _chunk(3, "lisinopril lowers blood pressure"),
        _chunk(4, "atorvastatin reduces cholesterol levels"),
    ]
    emb = MedicalEmbedder(dim=64)
    h = HybridIndex(dense_index=DenseIndex(emb, row_block=8),
                    bm25_index=BM25Index())
    h.index_chunks(docs)
    h.delete_chunks(["new0"])

    direct = h.search("unrelated query words", top_k=5)
    assert all(r["chunk_id"] != "new0" for r in direct)

    p = RetrievalPipeline(h)
    out = p.query("unrelated query words", top_k=5)
    assert all(r["chunk_id"] != "new0" for r in out["results"])
    # weighted fusion path too
    out = p.query_batch(["aspirin for fever"], top_k=5,
                        fusion_method="weighted")[0]
    assert all(r["chunk_id"] != "new0" for r in out["results"])


def test_tombstones_survive_capacity_growth():
    """Deleting a chunk then adding enough chunks to grow the dense matrix
    must NOT resurrect the deleted chunk (the growth path used to reset
    the whole validity mask to 1)."""
    import numpy as np

    from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
    from domain_rag_system_tpu.models import MedicalEmbedder
    from domain_rag_system_tpu.preprocessing import Chunk

    def C(cid, text):
        return Chunk(chunk_id=cid, doc_id="d" + cid, source="pubmed",
                     chunk_type="abstract", text=text, metadata={})

    hy = HybridIndex(dense_index=DenseIndex(MedicalEmbedder(dim=128),
                                            row_block=8),
                     bm25_index=BM25Index())
    hy.index_chunks([C("a", "aspirin pain"), C("b", "metformin diabetes"),
                     C("dead", "unique zoledronate osteoporosis")])
    assert hy.delete_chunks(["dead"]) == 1

    # force at least one capacity growth (row_block=8, 3 existing)
    hy.add_chunks_incremental([C(f"n{i}", f"filler document {i}")
                               for i in range(10)])
    assert np.asarray(hy.dense_index._valid)[2] == 0  # still tombstoned
    # the deleted chunk must not be retrievable by its own exact terms
    res = hy.search("zoledronate osteoporosis", top_k=5,
                    fusion_method="weighted", vector_weight=0.5,
                    bm25_weight=0.5)
    assert all(r["chunk_id"] != "dead" for r in res)
    # deleting again is a no-op (it stayed dead)
    assert hy.delete_chunks(["dead"]) == 0


def test_int8_add_preserves_existing_rows_exactly():
    """Incremental add on a quantized index dequantizes + re-quantizes the
    existing rows; per-row scales must make that round trip lossless (old
    rows' stored int8 values unchanged)."""
    import numpy as np

    from domain_rag_system_tpu.indexing import DenseIndex
    from domain_rag_system_tpu.models import MedicalEmbedder
    from domain_rag_system_tpu.preprocessing import Chunk

    def C(cid, text):
        return Chunk(chunk_id=cid, doc_id="d" + cid, source="pubmed",
                     chunk_type="abstract", text=text, metadata={})

    idx = DenseIndex(MedicalEmbedder(dim=128), row_block=8, dtype="int8")
    idx.index_chunks([C("a", "aspirin pain"), C("b", "metformin diabetes")])
    before = np.asarray(idx.embeddings)[:2].copy()
    scale_before = np.asarray(idx.row_scale)[:2].copy()

    idx.add_chunks([C("c", "insulin therapy glucose")])
    np.testing.assert_array_equal(np.asarray(idx.embeddings)[:2], before)
    np.testing.assert_allclose(np.asarray(idx.row_scale)[:2], scale_before,
                               rtol=1e-6)


def test_incremental_add_upserts_by_chunk_id():
    """Re-adding an existing chunk_id REPLACES the old version (Qdrant
    upsert semantics, reference vector_indexer.py:105-163) — never two
    live rows with the same id."""
    from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
    from domain_rag_system_tpu.models import MedicalEmbedder
    from domain_rag_system_tpu.preprocessing import Chunk

    def C(cid, text):
        return Chunk(chunk_id=cid, doc_id="d" + cid, source="pubmed",
                     chunk_type="abstract", text=text, metadata={})

    hy = HybridIndex(dense_index=DenseIndex(MedicalEmbedder(dim=64),
                                            row_block=8),
                     bm25_index=BM25Index())
    hy.index_chunks([C("a", "aspirin pain"), C("b", "insulin glucose")])
    hy.add_chunks_incremental([C("a", "aspirin pain UPDATED unique")])

    res = hy.search("aspirin pain", top_k=4, fusion_method="weighted",
                    vector_weight=0.5, bm25_weight=0.5)
    hits = [r for r in res if r["chunk_id"] == "a"]
    assert len(hits) == 1
    assert "UPDATED" in hits[0]["text"]

    # within one batch, the LAST occurrence of an id wins
    hy.add_chunks_incremental([C("c", "first version"),
                               C("c", "second version wins")])
    res = hy.search("version wins", top_k=4, fusion_method="weighted",
                    vector_weight=0.5, bm25_weight=0.5)
    hits = [r for r in res if r["chunk_id"] == "c"]
    assert len(hits) == 1 and "second" in hits[0]["text"]
