"""Stacked multi-encoder dense arm (models/stacked_embedder.py).

The stacked embedder concatenates weighted L2-normalized sub-encoder
embeddings so one dense index scores a weighted ensemble of encoder
cosines (score = Σ w_i²·cos_i). No reference counterpart — the reference
runs exactly one dense model (``src/indexing/embedder.py:21``).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from domain_rag_system_tpu.models.bert import BertConfig  # noqa: E402
from domain_rag_system_tpu.models.bert_embedder import BertEmbedder  # noqa: E402
from domain_rag_system_tpu.models.stacked_embedder import (  # noqa: E402
    StackedBertEmbedder,
)
from domain_rag_system_tpu.tokenization.wordpiece import (  # noqa: E402
    WordPieceTokenizer,
    train_wordpiece,
)

TEXTS = [
    "aspirin reduces fever and inflammation",
    "insulin regulates blood glucose in diabetes",
    "BRCA1 mutations raise breast cancer risk",
]


def _tiny_encoder(seed: int, hidden: int, vocab_texts):
    """A tiny randomly initialized bi-encoder with its OWN vocabulary."""
    tok = train_wordpiece(vocab_texts, vocab_size=200)
    cfg = BertConfig(vocab_size=len(tok), hidden_size=hidden, num_layers=1,
                     num_heads=2, intermediate_size=hidden * 2,
                     max_position_embeddings=32, dtype="float32")
    from domain_rag_system_tpu.models.bert import SentenceEncoder

    module = SentenceEncoder(cfg)
    rng = jax.random.PRNGKey(seed)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = module.init(rng, ids, jnp.ones((1, 8), jnp.int32))
    return BertEmbedder(config=cfg, params=params, tokenizer=tok,
                        max_length=32)


@pytest.fixture(scope="module")
def subs():
    a = _tiny_encoder(0, 32, TEXTS)
    b = _tiny_encoder(1, 48, TEXTS + ["different vocab seed text"])
    return a, b


def _stacked(subs, wa=1.0, wb=0.5):
    a, b = subs
    st = StackedBertEmbedder.__new__(StackedBertEmbedder)
    # bypass checkpoint loading: wire the live sub-embedders directly
    st.stack = [("a", wa), ("b", wb)]
    st.parts = [a, b]
    st.batch_size = 32
    st.max_length = min(a.max_length, b.max_length)
    st.model_name = "axb"
    from domain_rag_system_tpu.models.stacked_embedder import (
        StackedSentenceEncoder,
    )
    st._module = StackedSentenceEncoder(
        configs=(a.config, b.config), weights=(wa, wb))
    st._params = jax.device_put({"params": {
        "enc0": a.params["params"], "enc1": b.params["params"]}})
    return st


def test_encode_is_weighted_concat_of_parts(subs):
    a, b = subs
    st = _stacked(subs, wa=1.0, wb=0.5)
    e = st.encode(TEXTS)
    assert e.shape == (3, 32 + 48)
    assert np.allclose(e[:, :32], a.encode(TEXTS), atol=1e-6)
    assert np.allclose(e[:, 32:], 0.5 * b.encode(TEXTS), atol=1e-6)


def test_dot_product_is_weighted_cosine_sum(subs):
    a, b = subs
    st = _stacked(subs, wa=1.0, wb=0.5)
    q = st.encode([TEXTS[0]])[0]
    c = st.encode([TEXTS[1]])[0]
    cos_a = float(a.encode([TEXTS[0]])[0] @ a.encode([TEXTS[1]])[0])
    cos_b = float(b.encode([TEXTS[0]])[0] @ b.encode([TEXTS[1]])[0])
    assert float(q @ c) == pytest.approx(1.0 * cos_a + 0.25 * cos_b,
                                         abs=1e-5)


def test_encode_device_matches_host(subs):
    st = _stacked(subs)
    host = st.encode(TEXTS)
    dev = np.asarray(st.encode_device(TEXTS))
    assert np.allclose(dev, host, atol=1e-5)


def test_program_encoder_matches_host_encode(subs):
    """The in-program stacked forward (one jit, every sub-encoder) agrees
    with the host per-part encode. f32 configs here, so the tolerance is
    tight; production bf16 checkpoints agree to ~bf16 resolution."""
    st = _stacked(subs)
    mod, params = st.program_encoder()
    tok = st.tokenize_ids(TEXTS)
    assert tok.shape[0] == 2 * len(TEXTS)
    ids = jnp.asarray(tok)
    mask = (ids != 0).astype(jnp.int32).at[:, 0].set(1)
    out = np.asarray(mod.apply(params, ids, mask, jnp.zeros_like(ids),
                               deterministic=True))
    assert np.allclose(out, st.encode(TEXTS), atol=1e-4)


def test_pipeline_runs_with_stacked_embedder(subs):
    """End-to-end: stacked dense arm + BM25 through the fused batch
    program (in-program stacked encode engaged via program_encoder)."""
    from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
    from domain_rag_system_tpu.models.embedder import MedicalEmbedder
    from domain_rag_system_tpu.pipeline import RetrievalPipeline
    from domain_rag_system_tpu.preprocessing.documents import Chunk

    st = _stacked(subs)
    facade = MedicalEmbedder.__new__(MedicalEmbedder)
    facade.model_name = st.model_name
    facade.batch_size = 32
    facade.max_length = 32
    facade.checkpoint_path = None
    facade.stack = st.stack
    facade._impl = st

    chunks = [Chunk(chunk_id=f"c{i}", doc_id=f"d{i}", source="pubmed",
                    chunk_type="abstract", text=t, metadata={})
              for i, t in enumerate(TEXTS)]
    hybrid = HybridIndex(dense_index=DenseIndex(facade, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(chunks)
    pipe = RetrievalPipeline(hybrid)
    out = pipe.query_batch(["blood glucose insulin"], top_k=2,
                           fusion_method="weighted", vector_weight=0.5,
                           bm25_weight=0.5, group_by_doc=True)[0]
    assert out["num_results"] >= 1
    assert out["results"][0]["chunk_id"] == "c1"
