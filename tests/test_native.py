"""Native tokenizer: exact parity with the Python tokenizer on real corpus
text, and integration through BM25Index."""

import json
from pathlib import Path

import numpy as np
import pytest

from domain_rag_system_tpu.native import get_lib, tokenize_corpus_native
from domain_rag_system_tpu.tokenization import RegexTokenizer, Vocabulary

RECOVERED = Path(__file__).resolve().parent.parent / "data" / "recovered"

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def _python_reference(texts):
    tok = RegexTokenizer()
    tokenized = [tok.tokenize(t) for t in texts]
    vocab = Vocabulary.build(tokenized)
    return vocab.id_to_term, [vocab.encode(t) for t in tokenized]


def test_native_parity_simple():
    texts = [
        "Aspirin, 100mg; a dose! For the patient.",
        "BM25 scoring & hybrid-retrieval (RRF).",
        "",
        "under_scored tokens_1 stay together",
    ]
    native = tokenize_corpus_native(texts)
    assert native is not None
    n_vocab, n_docs = native
    p_vocab, p_docs = _python_reference(texts)
    assert n_vocab == p_vocab
    for nd, pd in zip(n_docs, p_docs):
        assert nd.tolist() == pd


@pytest.mark.skipif(not RECOVERED.exists(), reason="recovered data absent")
def test_native_parity_real_corpus():
    corpus = json.load(open(RECOVERED / "BioASQ" / "corpus_subset.json"))
    texts = [f"{d['title']} {d['abstract']}" for d in corpus[:400]]
    native = tokenize_corpus_native(texts)
    assert native is not None
    n_vocab, n_docs = native
    p_vocab, p_docs = _python_reference(texts)
    assert n_vocab == p_vocab
    mismatches = sum(1 for nd, pd in zip(n_docs, p_docs)
                     if nd.tolist() != pd)
    assert mismatches == 0


def test_native_preserved_terms():
    # single-char token 'q' survives only when preserved AND present
    native = tokenize_corpus_native(["the q value"], preserved=["q"])
    vocab, docs = native
    assert "q" in vocab
    native2 = tokenize_corpus_native(["the q value"], preserved=[])
    vocab2, _ = native2
    assert "q" not in vocab2


def test_bm25_index_native_matches_python(toy_chunks):
    from domain_rag_system_tpu.indexing import BM25Index

    a = BM25Index()
    a.index_chunks(toy_chunks, use_native=True)
    b = BM25Index()
    b.index_chunks(toy_chunks, use_native=False)
    assert a.vocab.id_to_term == b.vocab.id_to_term
    np.testing.assert_allclose(a.scores("diabetes treatment"),
                               b.scores("diabetes treatment"), rtol=1e-6)


def test_native_wordpiece_parity():
    from domain_rag_system_tpu.native import make_native_wordpiece
    from domain_rag_system_tpu.tokenization import train_wordpiece

    texts = ["Apixaban (Eliquis™) is an oral factor Xa inhibitor.",
             "Exon—skipping restores the reading frame… naïve patients",
             "plain ascii medical text with drugs and doses 50mg"] * 5
    tok = train_wordpiece(texts, vocab_size=300)
    nwp = make_native_wordpiece(tok.vocab)
    if nwp is None:
        import pytest
        pytest.skip("native lib unavailable")
    py_ids, py_mask, _ = tok.encode_batch(texts, max_length=48)
    n_ids, n_mask, _ = nwp.encode_batch(texts, max_length=48)
    np.testing.assert_array_equal(py_ids, n_ids)
    np.testing.assert_array_equal(py_mask, n_mask)


@pytest.mark.skipif(not RECOVERED.exists(), reason="recovered data absent")
def test_native_wordpiece_parity_real_corpus():
    import pathlib

    from domain_rag_system_tpu.native import make_native_wordpiece
    from domain_rag_system_tpu.persistence.checkpoints import (
        load_encoder_checkpoint)

    ckpt = pathlib.Path(__file__).resolve().parent.parent / "checkpoints" / "medrag-kw"
    if not ckpt.exists():
        pytest.skip("medrag-kw checkpoint absent")
    _, _, tok = load_encoder_checkpoint(ckpt)
    nwp = make_native_wordpiece(tok.vocab)
    corpus = json.load(open(RECOVERED / "BioASQ" / "corpus_subset.json"))
    texts = [f"{d['title']} {d['abstract']}" for d in corpus[:500]]
    py_ids, _, _ = tok.encode_batch(texts, max_length=128)
    n_ids, _, _ = nwp.encode_batch(texts, max_length=128)
    np.testing.assert_array_equal(py_ids, n_ids)
