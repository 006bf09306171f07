"""Contrastive trainer: loss decreases, sharded step runs on the 8-device
mesh with dp×tp, partitioning rules hit the intended parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from domain_rag_system_tpu.models.bert import BertConfig
from domain_rag_system_tpu.parallel import get_mesh
from domain_rag_system_tpu.tokenization import train_wordpiece
from domain_rag_system_tpu.training import ContrastiveTrainer, infonce_loss
from domain_rag_system_tpu.training.contrastive import make_pair_batches
from domain_rag_system_tpu.training.partitioning import partition_params

PAIRS = [
    ("what treats diabetes", "metformin is first line therapy for type 2 diabetes"),
    ("drug for high blood pressure", "lisinopril lowers blood pressure"),
    ("pain relief medicine", "ibuprofen relieves pain and inflammation"),
    ("antibiotic for infection", "amoxicillin treats bacterial infections"),
    ("depression treatment", "sertraline is prescribed for depression"),
    ("cholesterol lowering drug", "atorvastatin reduces cholesterol"),
    ("acid reflux remedy", "omeprazole treats gastroesophageal reflux"),
    ("blood thinner medication", "warfarin prevents blood clots"),
]


def test_infonce_loss_perfect_alignment():
    emb = jnp.eye(4, 32)
    loss, metrics = infonce_loss(emb, emb, temperature=0.05)
    assert metrics["accuracy"] == 1.0
    # temperature-scaled identity logits: loss near zero
    assert float(loss) < 0.01


def test_infonce_loss_misaligned_is_higher():
    emb = jnp.eye(4, 32)
    shuffled = jnp.roll(emb, 1, axis=0)
    aligned, _ = infonce_loss(emb, emb)
    misaligned, m = infonce_loss(emb, shuffled)
    assert float(misaligned) > float(aligned)
    assert m["accuracy"] == 0.0


def test_training_loss_decreases_single_device():
    tok = train_wordpiece([q + " " + p for q, p in PAIRS], vocab_size=256)
    config = BertConfig.tiny(vocab_size=len(tok), dropout_rate=0.0,
                             max_position_embeddings=32)
    trainer = ContrastiveTrainer(config, learning_rate=1e-3, warmup_steps=2,
                                 total_steps=60)
    trainer.init_state(seq_len=32)
    batches = list(make_pair_batches(tok, PAIRS, batch_size=8, seq_len=32,
                                     epochs=15))
    history = trainer.train(batches, log_every=0)
    first = np.mean([h["loss"] for h in history[:3]])
    last = np.mean([h["loss"] for h in history[-3:]])
    assert last < first * 0.7, (first, last)
    assert history[-1]["accuracy"] >= 0.75


def test_training_sharded_dp_tp_mesh():
    mesh = get_mesh(8, ("data", "model"), (4, 2))
    tok = train_wordpiece([q + " " + p for q, p in PAIRS], vocab_size=256)
    config = BertConfig.tiny(vocab_size=len(tok), dropout_rate=0.0,
                             max_position_embeddings=32)
    trainer = ContrastiveTrainer(config, mesh=mesh, learning_rate=1e-3,
                                 warmup_steps=1, total_steps=10)
    trainer.init_state(seq_len=32)
    batches = list(make_pair_batches(tok, PAIRS, batch_size=8, seq_len=32,
                                     epochs=2))
    history = trainer.train(batches, log_every=0)
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])

    # sharded and single-device training agree step-for-step
    solo = ContrastiveTrainer(config, learning_rate=1e-3, warmup_steps=1,
                              total_steps=10)
    solo.init_state(seq_len=32)
    solo_history = solo.train(batches, log_every=0)
    np.testing.assert_allclose(history[0]["loss"], solo_history[0]["loss"],
                               rtol=1e-4)


def test_partitioning_rules():
    config = BertConfig.tiny()
    from domain_rag_system_tpu.models.bert import SentenceEncoder

    module = SentenceEncoder(config)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                         jnp.ones((1, 8), jnp.int32))["params"]
    mesh = get_mesh(8, ("data", "model"), (4, 2))
    specs = partition_params(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_path = {"/".join(getattr(k, "key", str(k)) for k in path): spec
               for path, spec in flat}
    assert by_path["bert/layer_0/attention/query/kernel"] == P(None, "model", None)
    assert by_path["bert/layer_0/attention/output/kernel"] == P("model", None, None)
    assert by_path["bert/layer_0/intermediate/kernel"] == P(None, "model")
    assert by_path["bert/layer_0/mlp_output/kernel"] == P("model", None)
    assert by_path["bert/embeddings/word_embeddings/embedding"] == P()


def test_cross_encoder_trainer_learns():
    from domain_rag_system_tpu.training.cross_encoder import (
        CrossEncoderTrainer, make_relevance_batches)

    tok = train_wordpiece([q + " " + p for q, p in PAIRS], vocab_size=256)
    config = BertConfig.tiny(vocab_size=len(tok), dropout_rate=0.0,
                             max_position_embeddings=48)
    trainer = CrossEncoderTrainer(config, learning_rate=1e-3, warmup_steps=2,
                                  total_steps=80, group_size=2)
    trainer.init_state(seq_len=48)
    batches = list(make_relevance_batches(tok, PAIRS, batch_size=16,
                                          seq_len=48, negatives_per_positive=1,
                                          epochs=40))[:60]
    history = trainer.train(batches, log_every=0)
    first = np.mean([h["loss"] for h in history[:3]])
    last = np.mean([h["loss"] for h in history[-3:]])
    assert last < first * 0.8, (first, last)
    assert history[-1]["accuracy"] >= 0.7


def test_cross_encoder_checkpoint_roundtrip_into_reranker(tmp_path):
    from domain_rag_system_tpu.models.bert_embedder import CrossEncoderModel
    from domain_rag_system_tpu.persistence.checkpoints import (
        save_encoder_checkpoint)
    from domain_rag_system_tpu.training.cross_encoder import CrossEncoderTrainer

    tok = train_wordpiece([q + " " + p for q, p in PAIRS], vocab_size=128)
    config = BertConfig.tiny(vocab_size=len(tok), dropout_rate=0.0,
                             max_position_embeddings=48)
    trainer = CrossEncoderTrainer(config)
    trainer.init_state(seq_len=48)
    save_encoder_checkpoint(tmp_path / "cross", config, trainer.state.params, tok)

    model = CrossEncoderModel(checkpoint_path=str(tmp_path / "cross"),
                              batch_size=4)
    scores = model.predict([("what treats diabetes", "metformin treats diabetes"),
                            ("what treats diabetes", "astronomy of stars")])
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()

    # reranker factory now builds a REAL cross-encoder from the checkpoint
    from domain_rag_system_tpu.reranker import build_reranker
    rr = build_reranker("crossencoder", cross_checkpoint=str(tmp_path / "cross"))
    assert type(rr).__name__ == "CrossEncoderReranker"


def test_orbax_train_state_roundtrip(tmp_path):
    """Mid-training save/resume: restored trainer continues bit-identically."""
    from domain_rag_system_tpu.training.checkpointing import (
        restore_train_state, save_train_state)

    tok = train_wordpiece([q + " " + p for q, p in PAIRS], vocab_size=128)
    config = BertConfig.tiny(vocab_size=len(tok), dropout_rate=0.0,
                             max_position_embeddings=32)
    batches = list(make_pair_batches(tok, PAIRS, batch_size=8, seq_len=32,
                                     epochs=4))

    trainer = ContrastiveTrainer(config, learning_rate=1e-3, warmup_steps=1,
                                 total_steps=20)
    trainer.init_state(seq_len=32)
    trainer.train(batches[:2], log_every=0)
    save_train_state(trainer, tmp_path / "ck")
    after_save = trainer.train(batches[2:4], log_every=0)

    resumed = ContrastiveTrainer(config, learning_rate=1e-3, warmup_steps=1,
                                 total_steps=20)
    resumed.init_state(seq_len=32)
    step = restore_train_state(resumed, tmp_path / "ck")
    assert step == 2
    after_restore = resumed.train(batches[2:4], log_every=0)
    np.testing.assert_allclose(
        [h["loss"] for h in after_restore],
        [h["loss"] for h in after_save], rtol=1e-6)


def test_training_with_hard_negatives():
    from domain_rag_system_tpu.training.contrastive import (
        infonce_loss_with_hards)

    tok = train_wordpiece([q + " " + p for q, p in PAIRS], vocab_size=256)
    config = BertConfig.tiny(vocab_size=len(tok), dropout_rate=0.0,
                             max_position_embeddings=32)
    trainer = ContrastiveTrainer(config, learning_rate=1e-3, warmup_steps=2,
                                 total_steps=40)
    trainer.init_state(seq_len=32)
    hards = [[PAIRS[(i + 1) % len(PAIRS)][1], PAIRS[(i + 2) % len(PAIRS)][1]]
             for i in range(len(PAIRS))]
    batches = list(make_pair_batches(tok, PAIRS, batch_size=8, seq_len=32,
                                     epochs=10, hard_negatives=hards,
                                     hards_per_query=2))
    assert "h_ids" in batches[0]
    assert batches[0]["h_ids"].shape == (16, 32)  # B*K rows
    history = trainer.train(batches, log_every=0)
    assert history[-1]["loss"] < history[0]["loss"]

    # loss fn sanity: aligned positives + orthogonal hards -> acc 1
    import jax.numpy as jnp
    emb = jnp.eye(4, 32)
    hard = jnp.eye(8, 32, k=10)
    loss, m = infonce_loss_with_hards(emb, emb, hard)
    assert m["accuracy"] == 1.0


def test_extend_position_embeddings_tiles_table():
    """A short-position trunk initializes a longer-context cross-encoder:
    the tiled table repeats the learned positions and the forward pass
    accepts sequences at the new length."""
    from domain_rag_system_tpu.models.bert_embedder import CrossEncoderModel
    from domain_rag_system_tpu.persistence.checkpoints import (
        extend_position_embeddings)
    from domain_rag_system_tpu.training.cross_encoder import CrossEncoderTrainer

    tok = train_wordpiece([q + " " + p for q, p in PAIRS], vocab_size=128)
    config = BertConfig.tiny(vocab_size=len(tok), dropout_rate=0.0,
                             max_position_embeddings=16)
    trainer = CrossEncoderTrainer(config)
    trainer.init_state(seq_len=16)
    trunk = trainer.state.params["bert"]

    extended, new_config = extend_position_embeddings(trunk, config, 40)
    table_old = np.asarray(
        trunk["embeddings"]["position_embeddings"]["embedding"])
    table_new = np.asarray(
        extended["embeddings"]["position_embeddings"]["embedding"])
    assert new_config.max_position_embeddings == 40
    assert table_new.shape == (40, table_old.shape[1])
    np.testing.assert_array_equal(table_new[:16], table_old)
    np.testing.assert_array_equal(table_new[16:32], table_old)
    np.testing.assert_array_equal(table_new[32:], table_old[:8])
    # original trunk untouched
    assert np.asarray(
        trunk["embeddings"]["position_embeddings"]["embedding"]).shape[0] == 16

    # the extended trunk drives a forward at the new length
    params = dict(trainer.state.params)
    params["bert"] = extended
    model = CrossEncoderModel(config=new_config, params=params,
                              tokenizer=tok, max_length=40, batch_size=2)
    scores = model.predict([("a b c " * 10, "d e f " * 10)])
    assert np.isfinite(scores).all()

    # no-op when the trunk already covers the target length
    same, same_config = extend_position_embeddings(trunk, config, 16)
    assert same is trunk and same_config is config


def test_listwise_distill_loss_semantics():
    """KL distillation: perfect-match logits give ~0 loss; padding slots
    (teacher -inf) are excluded; argmax accuracy reflects teacher order."""
    import jax.numpy as jnp

    from domain_rag_system_tpu.training.cross_encoder import (
        listwise_distill_loss,
    )

    g = 4
    teacher = jnp.asarray([3.0, 2.0, 1.0, float("-inf"),
                           1.0, 5.0, 2.0, 0.5], jnp.float32)
    # student matching the teacher's normalized distribution exactly
    t = teacher.reshape(2, g)
    valid = jnp.isfinite(t)
    cnt = valid.sum(axis=1, keepdims=True)
    mean = jnp.where(valid, t, 0).sum(axis=1, keepdims=True) / cnt
    var = jnp.where(valid, (t - mean) ** 2, 0).sum(axis=1, keepdims=True) / cnt
    student = jnp.where(valid, (t - mean) / jnp.sqrt(var + 1e-6), 0.0)
    loss, m = listwise_distill_loss(student.reshape(-1), teacher, g)
    assert float(loss) < 1e-4
    assert float(m["accuracy"]) == 1.0

    # anti-correlated student: positive loss, zero accuracy
    bad = -student
    loss2, m2 = listwise_distill_loss(bad.reshape(-1), teacher, g)
    assert float(loss2) > 0.5
    assert float(m2["accuracy"]) == 0.0


def test_listwise_distill_gt_term():
    """The ground-truth softmax term: groups with gt slot -1 contribute 0;
    a student whose argmax hits the gt slot scores gt_accuracy 1 and a
    lower gt_loss than one that misses it; gt_weight=0 is the plain KL."""
    import jax.numpy as jnp

    from domain_rag_system_tpu.training.cross_encoder import (
        listwise_distill_loss,
    )

    g = 4
    teacher = jnp.asarray([3.0, 2.0, 1.0, 0.0,
                           1.0, 5.0, 2.0, 0.5], jnp.float32)
    student = jnp.asarray([0.0, 4.0, 0.0, 0.0,   # argmax slot 1
                           0.0, 4.0, 0.0, 0.0], jnp.float32)
    gt = jnp.asarray([1, -1], jnp.int32)  # group 0 gt=slot1, group 1 none

    base, _ = listwise_distill_loss(student, teacher, g)
    with_gt, m = listwise_distill_loss(student, teacher, g,
                                       gt_slots=gt, gt_weight=1.0)
    assert float(m["gt_accuracy"]) == 1.0
    # gt term is the CE of hitting slot 1 in group 0 only
    assert float(with_gt) > float(base)

    # student argmax at the WRONG slot: gt_loss larger, gt_accuracy 0
    miss = jnp.asarray([4.0, 0.0, 0.0, 0.0,
                        0.0, 4.0, 0.0, 0.0], jnp.float32)
    _, m_miss = listwise_distill_loss(miss, teacher, g,
                                      gt_slots=gt, gt_weight=1.0)
    assert float(m_miss["gt_accuracy"]) == 0.0
    assert float(m_miss["gt_loss"]) > float(m["gt_loss"])

    # gt_weight=0 (or no slots) falls back to the plain KL value
    same, m0 = listwise_distill_loss(student, teacher, g,
                                     gt_slots=gt, gt_weight=0.0)
    assert float(same) == float(base)
    assert "gt_loss" not in m0


def test_remat_contrastive_step_trains():
    """remat=True must trace: Dropout branches on `deterministic`, which
    nn.remat turns into a tracer unless marked static (round-4 fix —
    static_argnums=(3,) in BertEncoder)."""
    import numpy as np

    from domain_rag_system_tpu.models.bert import BertConfig
    from domain_rag_system_tpu.training import ContrastiveTrainer

    cfg = BertConfig.tiny(remat=True)
    tr = ContrastiveTrainer(cfg, learning_rate=1e-3, warmup_steps=1,
                            total_steps=2)
    tr.init_state(seq_len=16)
    rng = np.random.default_rng(0)
    b = {"q_ids": rng.integers(0, cfg.vocab_size, (8, 16)).astype(np.int32),
         "q_mask": np.ones((8, 16), np.int32),
         "p_ids": rng.integers(0, cfg.vocab_size, (8, 16)).astype(np.int32),
         "p_mask": np.ones((8, 16), np.int32)}
    h = tr.train([b], log_every=0)
    assert np.isfinite(h[0]["loss"])
