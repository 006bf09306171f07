"""MLM + ICT pretraining: masking semantics, tied-decoder training step,
ICT pair construction, warm-start param merging."""

import numpy as np
import pytest

from domain_rag_system_tpu.models.bert import BertConfig
from domain_rag_system_tpu.tokenization import train_wordpiece
from domain_rag_system_tpu.training import (
    ContrastiveTrainer,
    MLMTrainer,
    build_ict_pairs,
    make_mlm_batches,
    mask_tokens,
)
from domain_rag_system_tpu.training.contrastive import _merge_params

TEXTS = [
    "aspirin reduces fever and treats mild to moderate pain in adults",
    "metformin is the first line pharmacologic treatment for type 2 diabetes",
    "insulin therapy controls blood glucose in patients with diabetes",
    "lisinopril is an ace inhibitor used for hypertension and heart failure",
    "atorvastatin lowers ldl cholesterol and reduces cardiovascular risk",
    "amoxicillin is a penicillin antibiotic for bacterial infections",
] * 4


def test_mask_tokens_proportions_and_labels():
    rng = np.random.default_rng(0)
    tok = train_wordpiece(TEXTS, vocab_size=300)
    ids, mask, _ = tok.encode_batch(TEXTS, max_length=32)
    mask_id = tok.token_to_id["[MASK]"]
    special = (tok.pad_id, tok.unk_id, tok.cls_id, tok.sep_id, mask_id)

    masked, labels = mask_tokens(rng, ids, mask, mask_id, len(tok), special,
                                 mlm_prob=0.15)
    sel = labels >= 0
    # labels hold the ORIGINAL ids at selected positions only
    np.testing.assert_array_equal(labels[sel], ids[sel])
    assert (labels[~sel] == -100).all()
    # selection rate near 15% of maskable positions
    maskable = (mask > 0) & ~np.isin(ids, list(special))
    rate = sel.sum() / maskable.sum()
    assert 0.08 < rate < 0.25
    # ~80% of selected become [MASK]; none are PAD/CLS/SEP positions
    frac_mask = (masked[sel] == mask_id).mean()
    assert 0.6 < frac_mask < 0.95
    assert not sel[ids == tok.cls_id].any()
    assert not sel[mask == 0].any()
    # unselected positions unchanged
    np.testing.assert_array_equal(masked[~sel], ids[~sel])


def test_mlm_batches_and_training_step_reduces_loss():
    tok = train_wordpiece(TEXTS, vocab_size=300)
    config = BertConfig.tiny(vocab_size=len(tok), dropout_rate=0.1)
    trainer = MLMTrainer(config, learning_rate=1e-3, warmup_steps=2,
                         total_steps=40)
    batches = make_mlm_batches(tok, TEXTS, batch_size=8, seq_len=32, seed=0)
    import itertools

    history = trainer.train(itertools.islice(batches, 40), log_every=0)
    assert len(history) == 40
    assert np.isfinite([h["loss"] for h in history]).all()
    # the tied decoder must learn SOMETHING on 6 repeated sentences
    assert history[-1]["loss"] < history[0]["loss"]


def test_ict_pairs_remove_sentence():
    passages = [
        "Aspirin reduces fever in adults quickly. It also treats mild pain "
        "and inflammation effectively. Low doses prevent blood clots in "
        "cardiovascular patients.",
    ] * 3
    pairs = build_ict_pairs(passages, seed=0, remove_prob=1.0)
    assert pairs
    for query, context in pairs:
        assert query  # the sentence
        assert context
        assert query not in context  # removed with p=1.0
    # single-sentence passages are skipped (empty positives)
    assert build_ict_pairs(["One short sentence only here."], seed=0) == []


def test_merge_params_warm_start():
    import jax.numpy as jnp

    base = {"bert": {"w": jnp.zeros((2, 2))}, "head": {"b": jnp.zeros(3)}}
    override = {"bert": {"w": jnp.ones((2, 2))}, "mlm_head": {"x": jnp.ones(1)}}
    merged = _merge_params(base, override)
    np.testing.assert_array_equal(np.asarray(merged["bert"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(merged["head"]["b"]), 0.0)
    assert "mlm_head" not in merged  # extra subtrees dropped
    with pytest.raises(ValueError):
        _merge_params(base, {"bert": {"w": jnp.ones((3, 3))}})


def test_mlm_bert_subtree_warm_starts_sentence_encoder():
    """The MLM 'bert' params must load into SentenceEncoder unchanged
    (same module names/geometry) so pretraining actually transfers."""
    tok = train_wordpiece(TEXTS, vocab_size=300)
    config = BertConfig.tiny(vocab_size=len(tok), dropout_rate=0.0)
    mlm = MLMTrainer(config, total_steps=5)
    mlm.init_state(seq_len=32)
    bert_params = mlm.state.params["bert"]

    tr = ContrastiveTrainer(config, total_steps=5)
    tr.init_state(seq_len=32, init_params={"bert": bert_params})
    import jax

    leaves_mlm = jax.tree_util.tree_leaves(bert_params)
    leaves_se = jax.tree_util.tree_leaves(tr.state.params["bert"])
    assert len(leaves_mlm) == len(leaves_se)
    for a, b in zip(leaves_mlm, leaves_se):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
