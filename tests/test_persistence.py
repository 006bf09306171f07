"""Index bundle save/load round trip."""

import numpy as np

from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.models import MedicalEmbedder
from domain_rag_system_tpu.persistence import IndexBundle, load_index, save_index


def test_bundle_round_trip(tmp_path, toy_chunks):
    hybrid = HybridIndex(
        dense_index=DenseIndex(MedicalEmbedder(dim=256), row_block=8),
        bm25_index=BM25Index(),
    )
    hybrid.index_chunks(toy_chunks)
    before = hybrid.search("diabetes treatment", top_k=5)

    save_index(hybrid, tmp_path / "idx", extra_manifest={"note": "test"})
    loaded = load_index(tmp_path / "idx")

    assert len(loaded.chunks) == len(toy_chunks)
    after = loaded.search("diabetes treatment", top_k=5)
    assert [r["chunk_id"] for r in after] == [r["chunk_id"] for r in before]
    np.testing.assert_allclose(
        [r["score"] for r in after], [r["score"] for r in before], rtol=1e-6
    )

    manifest = IndexBundle.open(tmp_path / "idx").manifest
    assert manifest["note"] == "test"
    assert manifest["num_chunks"] == len(toy_chunks)
    assert manifest["bm25"]["k1"] == 1.5

    # no pickle anywhere in the bundle
    files = {p.name for p in (tmp_path / "idx").iterdir()}
    assert files == {"manifest.json", "chunks.jsonl", "dense.npz",
                     "bm25.npz", "vocab.json"}


def test_bundle_bm25_only(tmp_path, toy_chunks):
    hybrid = HybridIndex(bm25_index=BM25Index())
    hybrid.index_chunks(toy_chunks)
    save_index(hybrid, tmp_path / "idx")
    loaded = load_index(tmp_path / "idx")
    assert loaded.dense_index is None
    r = loaded.search("insulin", top_k=2)
    assert r and "insulin" in r[0]["text"]


def test_loaded_index_supports_filters(tmp_path, toy_chunks):
    hybrid = HybridIndex(
        dense_index=DenseIndex(MedicalEmbedder(dim=128), row_block=8),
        bm25_index=BM25Index(),
    )
    hybrid.index_chunks(toy_chunks)
    save_index(hybrid, tmp_path / "idx")
    loaded = load_index(tmp_path / "idx")
    results = loaded.search("pain", top_k=4, filters={"source_tag": "odd"})
    assert results
    assert all(r["metadata"]["source_tag"] == "odd" for r in results)


def test_bundle_round_trip_int8(tmp_path, toy_chunks):
    hybrid = HybridIndex(
        dense_index=DenseIndex(MedicalEmbedder(dim=256), row_block=8,
                               dtype="int8"),
        bm25_index=BM25Index(),
    )
    hybrid.index_chunks(toy_chunks)
    before = hybrid.search("diabetes treatment", top_k=5)
    save_index(hybrid, tmp_path / "idx8")
    loaded = load_index(tmp_path / "idx8")
    assert loaded.dense_index.embeddings.dtype.name == "int8"
    after = loaded.search("diabetes treatment", top_k=5)
    assert [r["chunk_id"] for r in after] == [r["chunk_id"] for r in before]
    np.testing.assert_allclose([r["score"] for r in after],
                               [r["score"] for r in before], rtol=1e-5)


def test_loaded_bundle_supports_incremental_updates(tmp_path, toy_chunks):
    from domain_rag_system_tpu.preprocessing import Chunk

    hybrid = HybridIndex(bm25_index=BM25Index())
    hybrid.index_chunks(toy_chunks)
    save_index(hybrid, tmp_path / "idx")
    loaded = load_index(tmp_path / "idx")
    loaded.bm25_index.add_chunks([Chunk("new0", "nd0", "pubmed", "abstract",
                                        "zanamivir treats influenza", {})])
    r = loaded.bm25_index.search("zanamivir", top_k=2)
    assert r and r[0]["chunk_id"] == "new0"
    assert loaded.bm25_index.delete_chunks(["new0"]) == 1


def test_bundle_records_and_restores_learned_encoder(tmp_path, toy_chunks):
    """A bundle built with a learned (checkpoint) encoder must restore the
    SAME query-time encoder: before this was recorded, load_index silently
    fell back to the hash embedder and dense query scores were computed
    against incompatible corpus vectors."""
    import numpy as np
    import pytest

    from domain_rag_system_tpu.indexing import DenseIndex, HybridIndex
    from domain_rag_system_tpu.models import MedicalEmbedder
    from domain_rag_system_tpu.models.bert import BertConfig, SentenceEncoder
    from domain_rag_system_tpu.persistence.checkpoints import (
        save_encoder_checkpoint,
    )
    from domain_rag_system_tpu.tokenization import train_wordpiece
    import jax
    import jax.numpy as jnp

    # train a tiny encoder checkpoint on the toy corpus
    texts = [c.text for c in toy_chunks]
    tokenizer = train_wordpiece(texts * 2, vocab_size=200)
    config = BertConfig.tiny(vocab_size=len(tokenizer), dropout_rate=0.0)
    module = SentenceEncoder(config)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                         jnp.ones((1, 8), jnp.int32))
    ckpt_dir = tmp_path / "enc"
    save_encoder_checkpoint(str(ckpt_dir), config, params["params"], tokenizer)

    embedder = MedicalEmbedder(backend="bert", checkpoint_path=str(ckpt_dir))
    assert embedder.backend_name == "BertEmbedder"
    hybrid = HybridIndex(dense_index=DenseIndex(embedder, row_block=8))
    hybrid.index_chunks(toy_chunks)
    save_index(hybrid, tmp_path / "idx")

    loaded = load_index(tmp_path / "idx")
    assert loaded.dense_index.embedder.backend_name == "BertEmbedder"
    # identical query embeddings -> identical dense rankings
    q = "aspirin for pain"
    np.testing.assert_allclose(
        np.asarray(embedder.encode([q])), np.asarray(
            loaded.dense_index.embedder.encode([q])), atol=1e-6)

    # a missing checkpoint must fail loudly, not degrade silently
    import shutil
    shutil.rmtree(ckpt_dir)
    with pytest.raises(FileNotFoundError, match="encoder checkpoint"):
        load_index(tmp_path / "idx")


def test_bundle_compacts_tombstoned_chunks(tmp_path, toy_chunks):
    """Saving after delete_chunks writes a compacted snapshot: the deleted
    chunk is gone from chunks.jsonl and both array files, so loading can
    never resurrect it (round-1 bundles dropped the validity masks)."""
    from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
    from domain_rag_system_tpu.models import MedicalEmbedder
    from domain_rag_system_tpu.preprocessing import Chunk

    def C(cid, text):
        return Chunk(chunk_id=cid, doc_id="d" + cid, source="pubmed",
                     chunk_type="abstract", text=text, metadata={})

    hy = HybridIndex(dense_index=DenseIndex(MedicalEmbedder(dim=128),
                                            row_block=8),
                     bm25_index=BM25Index())
    hy.index_chunks([C("a", "aspirin pain"),
                     C("dead", "zoledronate osteoporosis unique"),
                     C("c", "insulin glucose")])
    assert hy.delete_chunks(["dead"]) == 1
    save_index(hy, tmp_path / "idx")

    loaded = load_index(tmp_path / "idx")
    assert len(loaded.chunks) == 2
    assert all(c.chunk_id != "dead" for c in loaded.chunks)
    res = loaded.search("zoledronate osteoporosis", top_k=3,
                        fusion_method="weighted", vector_weight=0.5,
                        bm25_weight=0.5)
    assert all(r["chunk_id"] != "dead" for r in res)
    # surviving chunks still retrievable with aligned rows
    res2 = loaded.search("aspirin pain", top_k=1, fusion_method="weighted",
                         vector_weight=0.5, bm25_weight=0.5)
    assert res2[0]["chunk_id"] == "a"


def test_embedding_cache_roundtrip(tmp_path, toy_chunks):
    """build_pipeline(embedding_cache_dir=...): the first build encodes and
    writes the cache; a rebuild loads it (bit-identical index rows) and any
    corpus change invalidates the key."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.models.bert import BertConfig, SentenceEncoder
    from domain_rag_system_tpu.persistence.checkpoints import (
        save_encoder_checkpoint,
    )
    from domain_rag_system_tpu.serving import build_pipeline
    from domain_rag_system_tpu.tokenization import train_wordpiece

    texts = [c.text for c in toy_chunks]
    tokenizer = train_wordpiece(texts * 2, vocab_size=400)
    config = BertConfig.tiny(vocab_size=len(tokenizer), dropout_rate=0.0)
    module = SentenceEncoder(config)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                         jnp.ones((1, 8), jnp.int32))["params"]
    ckpt = save_encoder_checkpoint(tmp_path / "ckpt", config, params, tokenizer)

    cfg = RetrievalConfig(encoder_checkpoint=str(ckpt))
    cache = tmp_path / "embcache"
    p1, _ = build_pipeline(cfg, chunks=toy_chunks,
                           embedding_cache_dir=str(cache))
    cached = list(cache.glob("emb_*.npz"))
    assert len(cached) == 1
    p2, _ = build_pipeline(cfg, chunks=toy_chunks,
                           embedding_cache_dir=str(cache))
    np.testing.assert_array_equal(
        np.asarray(p1.index.dense_index.embeddings),
        np.asarray(p2.index.dense_index.embeddings))
    # retrieval through the cached index agrees with the encoded one
    q = "aspirin for fever and pain"
    r1 = p1.query(q, top_k=3)["results"]
    r2 = p2.query(q, top_k=3)["results"]
    assert [r["chunk_id"] for r in r1] == [r["chunk_id"] for r in r2]
    # corpus change -> different key, no stale hit
    mutated = list(toy_chunks)
    mutated[0] = type(toy_chunks[0])(
        chunk_id=toy_chunks[0].chunk_id, doc_id=toy_chunks[0].doc_id,
        source=toy_chunks[0].source, chunk_type=toy_chunks[0].chunk_type,
        text=toy_chunks[0].text + " mutated", metadata={})
    build_pipeline(cfg, chunks=mutated, embedding_cache_dir=str(cache))
    assert len(list(cache.glob("emb_*.npz"))) == 2


def test_bundle_records_and_restores_stacked_encoder(tmp_path, toy_chunks):
    """A bundle built with the STACKED multi-encoder dense arm must
    restore the same concatenated query encoder (the shipping
    quality_at_scale profile): without the manifest record, load_index
    silently degraded to the hash embedder."""
    import jax
    import jax.numpy as jnp
    import pytest

    from domain_rag_system_tpu.indexing import DenseIndex, HybridIndex
    from domain_rag_system_tpu.models import MedicalEmbedder
    from domain_rag_system_tpu.models.bert import BertConfig, SentenceEncoder
    from domain_rag_system_tpu.persistence.checkpoints import (
        save_encoder_checkpoint,
    )
    from domain_rag_system_tpu.tokenization import train_wordpiece

    texts = [c.text for c in toy_chunks]
    ckpts = []
    for seed, hidden in ((0, 32), (1, 48)):
        tokenizer = train_wordpiece(texts * 2, vocab_size=200)
        config = BertConfig.tiny(vocab_size=len(tokenizer), hidden_size=hidden,
                                 dropout_rate=0.0)
        module = SentenceEncoder(config)
        params = module.init(jax.random.PRNGKey(seed),
                             jnp.zeros((1, 8), jnp.int32),
                             jnp.ones((1, 8), jnp.int32))
        ckpt_dir = tmp_path / f"enc{seed}"
        save_encoder_checkpoint(str(ckpt_dir), config, params["params"],
                                tokenizer)
        ckpts.append(str(ckpt_dir))

    stack = [(ckpts[0], 1.0), (ckpts[1], 0.5)]
    embedder = MedicalEmbedder(backend="stacked", stack=stack)
    assert embedder.backend_name == "StackedBertEmbedder"
    hybrid = HybridIndex(dense_index=DenseIndex(embedder, row_block=8))
    hybrid.index_chunks(toy_chunks)
    save_index(hybrid, tmp_path / "idx")

    loaded = load_index(tmp_path / "idx")
    assert loaded.dense_index.embedder.backend_name == "StackedBertEmbedder"
    q = "aspirin for pain"
    np.testing.assert_allclose(
        np.asarray(embedder.encode([q])),
        np.asarray(loaded.dense_index.embedder.encode([q])), atol=1e-5)

    # a missing sub-encoder checkpoint must fail loudly
    import shutil
    shutil.rmtree(ckpts[1])
    with pytest.raises(FileNotFoundError, match="stacked"):
        load_index(tmp_path / "idx")
