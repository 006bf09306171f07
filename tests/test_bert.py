"""Flax BERT correctness: HF-conversion parity against transformers' torch
forward on randomly initialized weights, pooling semantics, wrappers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_rag_system_tpu.models.bert import (
    BertConfig,
    CrossEncoder,
    SentenceEncoder,
    l2_normalize,
    mean_pool,
)
from domain_rag_system_tpu.tokenization import train_wordpiece


def small_hf_config():
    from transformers import BertConfig as HFBertConfig

    return HFBertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )


def test_flax_bert_matches_hf_torch_forward():
    """Identical math to HF BERT ⇒ converted checkpoints are bit-faithful."""
    torch = pytest.importorskip("torch")
    from transformers import BertModel

    from domain_rag_system_tpu.models.hf_convert import (
        config_from_hf, convert_state_dict)

    hf_cfg = small_hf_config()
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    config = config_from_hf(hf_cfg.to_dict())
    params = convert_state_dict(state, config)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 99, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), dtype=np.int32)
    mask[1, 6:] = 0
    types = np.zeros((2, 10), dtype=np.int32)

    with torch.no_grad():
        hf_out = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(types, dtype=torch.long),
        ).last_hidden_state.numpy()

    from domain_rag_system_tpu.models.bert import BertEncoder

    flax_out = BertEncoder(config).apply(
        {"params": params["bert"]},
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types),
        deterministic=True,
    )
    valid = mask[..., None].astype(bool)
    np.testing.assert_allclose(
        np.where(valid, np.asarray(flax_out), 0),
        np.where(valid, hf_out, 0),
        rtol=2e-4, atol=2e-5,
    )


def test_cross_encoder_matches_hf_sequence_classifier():
    torch = pytest.importorskip("torch")
    from transformers import BertForSequenceClassification

    from domain_rag_system_tpu.models.hf_convert import (
        config_from_hf, convert_state_dict)

    hf_cfg = small_hf_config()
    hf_cfg.num_labels = 1
    torch.manual_seed(1)
    model = BertForSequenceClassification(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    config = config_from_hf(hf_cfg.to_dict())
    params = convert_state_dict(state, config)
    # HF BertForSequenceClassification drops the pooler? No — it keeps it.
    assert "pooler" in params and "classifier" in params

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 99, size=(3, 12)).astype(np.int32)
    mask = np.ones((3, 12), dtype=np.int32)
    types = np.zeros((3, 12), dtype=np.int32)
    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(types, dtype=torch.long),
        ).logits.numpy()[:, 0]

    flax_logits = CrossEncoder(config).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(types), deterministic=True)
    np.testing.assert_allclose(np.asarray(flax_logits), hf_logits,
                               rtol=2e-4, atol=2e-5)


def test_mean_pool_ignores_padding():
    hidden = jnp.asarray(np.stack([
        np.ones((4, 8)), np.arange(32).reshape(4, 8).astype(np.float32)]))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], dtype=jnp.int32)
    pooled = mean_pool(hidden, mask)
    np.testing.assert_allclose(pooled[0], np.ones(8))
    np.testing.assert_allclose(pooled[1], np.arange(32).reshape(4, 8).mean(0))


def test_sentence_encoder_shapes_and_norm():
    config = BertConfig.tiny(dropout_rate=0.0)
    module = SentenceEncoder(config)
    ids = jnp.zeros((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids, mask)
    emb = module.apply(params, ids, mask)
    assert emb.shape == (2, config.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               rtol=1e-5)


def test_pre_ln_encoder_forward_and_roundtrip(tmp_path):
    """pre_ln=True: same param tree as post-LN plus the stack's final_norm,
    normalized output, and the flag survives a checkpoint round-trip (the
    depth-trainability fix — post-LN stops training past ~8 layers)."""
    from domain_rag_system_tpu.persistence.checkpoints import (
        load_encoder_checkpoint,
        save_encoder_checkpoint,
    )
    from domain_rag_system_tpu.tokenization import train_wordpiece

    config = BertConfig.tiny(dropout_rate=0.0, pre_ln=True)
    module = SentenceEncoder(config)
    ids = jnp.zeros((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids, mask)
    emb = module.apply(params, ids, mask)
    assert emb.shape == (2, config.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               rtol=1e-5)

    layer0 = params["params"]["bert"]["layer_0"]
    assert {"attention_norm", "mlp_norm"} <= set(layer0)  # names stable
    assert "final_norm" in params["params"]["bert"]

    post = SentenceEncoder(BertConfig.tiny(dropout_rate=0.0))
    post_params = post.init(jax.random.PRNGKey(0), ids, mask)
    assert "final_norm" not in post_params["params"]["bert"]

    tok = train_wordpiece(["alpha beta gamma delta"] * 4, vocab_size=64)
    save_encoder_checkpoint(tmp_path / "ck", config, params["params"], tok)
    loaded_config, loaded, _ = load_encoder_checkpoint(tmp_path / "ck")
    assert loaded_config.pre_ln is True
    emb2 = module.apply({"params": loaded}, ids, mask)
    np.testing.assert_allclose(np.asarray(emb2), np.asarray(emb), rtol=2e-3,
                               atol=2e-3)


def test_bert_embedder_wrapper_end_to_end():
    from domain_rag_system_tpu.models.bert_embedder import BertEmbedder

    texts = ["aspirin treats pain", "insulin controls diabetes",
             "completely unrelated astronomy text about stars"]
    tokenizer = train_wordpiece(texts * 3, vocab_size=200)
    config = BertConfig.tiny(vocab_size=len(tokenizer), dropout_rate=0.0)
    module = SentenceEncoder(config)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids, jnp.ones((1, 8), jnp.int32))

    emb = BertEmbedder(config=config, params=params["params"],
                       tokenizer=tokenizer, max_length=64, batch_size=4)
    vecs = emb.encode(texts)
    assert vecs.shape == (3, config.hidden_size)
    # deterministic
    np.testing.assert_array_equal(vecs, emb.encode(texts))
    info = emb.get_model_info()
    assert info["vocab_size"] == len(tokenizer)


def test_wordpiece_train_and_encode():
    texts = ["metformin treats diabetes mellitus"] * 5 + \
            ["insulin therapy for diabetes"] * 5
    tok = train_wordpiece(texts, vocab_size=120)
    ids, mask, types = tok.encode_batch(["metformin for diabetes"],
                                        max_length=16)
    assert ids.shape == (1, 16)
    assert mask[0].sum() >= 4  # cls + tokens + sep
    assert ids[0][0] == tok.cls_id
    # pair encoding sets token_type 1 on the second segment
    ids2, mask2, types2 = tok.encode_batch(
        ["what treats diabetes"], ["metformin treats diabetes"], max_length=32)
    assert types2[0].max() == 1


def test_bert_embedder_clamps_to_position_table():
    """Inputs longer than max_position_embeddings must be truncated, not
    index the position embedding out of range (regression: garbage
    embeddings for every text when buckets exceeded the trained length)."""
    from domain_rag_system_tpu.models.bert_embedder import BertEmbedder
    import jax, numpy as np
    from domain_rag_system_tpu.models.bert import SentenceEncoder
    import jax.numpy as jnp

    texts = ["word " * 300]  # far beyond 32 positions
    tokenizer = train_wordpiece(["word another token"] * 3, vocab_size=64)
    config = BertConfig.tiny(vocab_size=len(tokenizer), dropout_rate=0.0,
                             max_position_embeddings=32)
    module = SentenceEncoder(config)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                         jnp.ones((1, 8), jnp.int32))
    emb = BertEmbedder(config=config, params=params["params"],
                       tokenizer=tokenizer, max_length=512, batch_size=2)
    assert emb.max_length == 32
    vecs = emb.encode(texts)
    assert np.isfinite(vecs).all()
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)


def test_encode_device_matches_encode():
    """Single-upload device-resident encode (mask/types derived on device)
    equals the host encode path, including across internal batch splits."""
    from domain_rag_system_tpu.models.bert_embedder import BertEmbedder

    texts = ["aspirin treats pain", "insulin controls diabetes",
             "beta blockers lower blood pressure", "statins reduce ldl",
             "short", "a much longer text about metformin and glucose"]
    tokenizer = train_wordpiece(texts * 3, vocab_size=200)
    config = BertConfig.tiny(vocab_size=len(tokenizer), dropout_rate=0.0)
    module = SentenceEncoder(config)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids, jnp.ones((1, 8), jnp.int32))

    emb = BertEmbedder(config=config, params=params["params"],
                       tokenizer=tokenizer, max_length=64, batch_size=4)
    host = emb.encode(texts)                      # 2 internal batches
    dev = np.asarray(emb.encode_device(texts))
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)

    one = np.asarray(emb.encode_device("aspirin treats pain"))
    np.testing.assert_allclose(one[0], host[0], rtol=1e-5, atol=1e-5)


def test_bucketing_uses_true_token_lengths_no_silent_truncation():
    """Round-1 estimated tokens as len(text)//3; dense prose packing more
    tokens than that was silently truncated to a too-small bucket
    (VERDICT.md round-1 weak item 7). Bucketing must use REAL tokenized
    lengths: a text whose token count far exceeds len//3 keeps every token."""
    from domain_rag_system_tpu.models.bert_embedder import BertEmbedder

    # 90 single-letter words: ~92 tokens but len//3 ≈ 60 — the old
    # heuristic picked the 64-wide bucket and truncated ~30 tokens.
    dense = " ".join(["a"] * 90)
    tokenizer = train_wordpiece([dense, "some other text"] * 3, vocab_size=120)
    config = BertConfig.tiny(vocab_size=len(tokenizer), dropout_rate=0.0)
    module = SentenceEncoder(config)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids0,
                         jnp.ones((1, 8), jnp.int32))
    emb = BertEmbedder(config=config, params=params["params"],
                       tokenizer=tokenizer, max_length=512, batch_size=4)

    full_ids, full_mask, _ = tokenizer.encode_batch([dense], max_length=512)
    true_len = int(full_mask.sum())
    assert true_len > len(dense) // 3  # the premise of the bug

    ids, mask, _ = emb._tokenize_bucketed([dense])
    assert ids.shape[1] >= true_len          # bucket fits the real length
    assert int(mask.sum()) == true_len       # nothing truncated
