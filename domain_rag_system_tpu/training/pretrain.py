"""Corpus-only encoder pretraining: MLM + Inverse Cloze Task (ICT).

The reference leans on a *downloaded* domain-pretrained encoder
(``src/indexing/embedder.py:21`` S-PubMedBert-MS-MARCO). No pretrained
weights exist in this environment, so the framework builds its own domain
prior from raw corpus text before any contrastive fine-tuning:

  1. **MLM** — BERT masked-language-model objective over corpus chunks.
     The decoder is TIED to the input word-embedding table (logits =
     transformed hidden @ table.T + bias) — on a small corpus the tied
     decoder regularizes both and roughly halves the trainable
     parameters at the output.
  2. **ICT** (Lee et al. 2019, ORQA) — a sentence is the pseudo-query,
     its surrounding passage (with the sentence REMOVED 90% of the time)
     is the positive; in-batch InfoNCE. Removing the sentence forces the
     match to rest on topical context rather than lexical overlap — the
     alignment signal BM25 cannot provide.

Both objectives are leakage-free: they read only corpus documents, never
evaluation queries. The MLM encoder's ``bert`` subtree initializes the
:class:`~domain_rag_system_tpu.models.bert.SentenceEncoder` for ICT, and
the ICT checkpoint seeds the contrastive fine-tune
(``scripts/train_encoder.py --init_checkpoint``).

TPU notes: one jitted train step per objective (static shapes, bf16
compute / f32 loss), masking done host-side with numpy (cheap, keeps the
device program static), ``optax`` adamw with warmup-cosine.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from domain_rag_system_tpu.models.bert import BertConfig, BertEncoder
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


class BertForMLM(nn.Module):
    """BERT encoder + MLM transform head.

    Returns the transformed hidden states [B, L, H] plus the decoder bias
    [V]; the tied logits (``hidden @ word_table.T + bias``) are computed in
    the loss function from the parameter tree, which is the functional-JAX
    way to share the embedding table without module surgery.
    """

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        c = self.config
        hidden = BertEncoder(c, name="bert")(
            input_ids, attention_mask, None, deterministic)
        x = nn.Dense(c.hidden_size, name="mlm_transform")(
            hidden.astype(jnp.float32))
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="mlm_norm")(x)
        bias = self.param("mlm_bias", nn.initializers.zeros,
                          (c.vocab_size,), jnp.float32)
        return x, bias


def mask_tokens(
    rng: np.random.Generator,
    ids: np.ndarray,          # [B, L] int32 token ids
    attention_mask: np.ndarray,  # [B, L] 1 = real token
    mask_id: int,
    vocab_size: int,
    special_ids: Sequence[int],
    mlm_prob: float = 0.15,
) -> Tuple[np.ndarray, np.ndarray]:
    """BERT-style masking: of the selected 15%, 80% → [MASK], 10% → random
    token, 10% kept. Returns (masked_ids, labels) with labels = -100 at
    unselected positions (ignored by the loss)."""
    ids = ids.copy()
    labels = np.full_like(ids, -100)
    special = np.isin(ids, np.asarray(list(special_ids)))
    candidates = (attention_mask > 0) & ~special
    selected = candidates & (rng.random(ids.shape) < mlm_prob)
    labels[selected] = ids[selected]

    roll = rng.random(ids.shape)
    to_mask = selected & (roll < 0.8)
    to_random = selected & (roll >= 0.8) & (roll < 0.9)
    ids[to_mask] = mask_id
    n_special = len(special_ids)
    ids[to_random] = rng.integers(n_special, vocab_size,
                                  size=int(to_random.sum()))
    return ids, labels


def make_mlm_batches(
    tokenizer,
    texts: Sequence[str],
    batch_size: int,
    seq_len: int = 128,
    epochs: int = 1000,
    seed: int = 0,
    mlm_prob: float = 0.15,
) -> Iterable[Dict[str, np.ndarray]]:
    """Tokenize corpus passages once, then yield masked batches forever
    (bounded by ``epochs``); each epoch reshuffles and remasks."""
    ids_all, mask_all, _ = tokenizer.encode_batch(list(texts),
                                                  max_length=seq_len)
    mask_token_id = tokenizer.token_to_id["[MASK]"]
    special_ids = (tokenizer.pad_id, tokenizer.unk_id, tokenizer.cls_id,
                   tokenizer.sep_id, mask_token_id)
    rng = np.random.default_rng(seed)
    n = len(texts)
    for _ in range(epochs):
        order = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            sel = order[start:start + batch_size]
            ids, labels = mask_tokens(
                rng, ids_all[sel], mask_all[sel], mask_token_id,
                len(tokenizer), special_ids, mlm_prob)
            yield {"ids": ids, "mask": mask_all[sel], "labels": labels}


@dataclasses.dataclass
class MLMState:
    params: Dict
    opt_state: optax.OptState
    step: int = 0


class MLMTrainer:
    """Single-chip (or data-parallel) MLM pretrainer."""

    def __init__(
        self,
        config: BertConfig,
        learning_rate: float = 3e-4,
        warmup_steps: int = 200,
        total_steps: int = 5_000,
        seed: int = 0,
    ):
        self.config = config
        self.module = BertForMLM(config)
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1))
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(schedule, weight_decay=0.01),
        )
        self._seed = seed
        self.state: Optional[MLMState] = None

    def init_state(self, seq_len: int = 128) -> MLMState:
        rng = jax.random.PRNGKey(self._seed)
        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.int32)
        params = self.module.init({"params": rng}, ids, mask)["params"]
        self.state = MLMState(params, self.optimizer.init(params))
        return self.state

    def _build_step(self):
        module, optimizer = self.module, self.optimizer

        @jax.jit
        def step(params, opt_state, rng, ids, mask, labels):
            def loss_fn(p):
                x, bias = module.apply({"params": p}, ids, mask,
                                       deterministic=False,
                                       rngs={"dropout": rng})
                table = p["bert"]["embeddings"]["word_embeddings"][
                    "embedding"].astype(jnp.float32)           # [V, H]
                logits = jnp.einsum("blh,vh->blv", x, table) + bias
                sel = labels >= 0
                safe_labels = jnp.where(sel, labels, 0)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, safe_labels)
                denom = jnp.maximum(sel.sum(), 1)
                loss = jnp.where(sel, ce, 0.0).sum() / denom
                acc = (jnp.where(sel, jnp.argmax(logits, -1) == safe_labels,
                                 False).sum() / denom)
                return loss, acc

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, acc

        return step

    def train(self, batches: Iterable[Dict[str, np.ndarray]],
              log_every: int = 50) -> List[Dict[str, float]]:
        if self.state is None:
            # infer seq_len from the first batch
            batches = iter(batches)
            first = next(batches)
            self.init_state(seq_len=first["ids"].shape[1])
            import itertools
            batches = itertools.chain([first], batches)
        step_fn = self._build_step()
        rng = jax.random.PRNGKey(self._seed + 1)
        history = []
        for i, batch in enumerate(batches):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss, acc = step_fn(
                self.state.params, self.state.opt_state, sub,
                jnp.asarray(batch["ids"]), jnp.asarray(batch["mask"]),
                jnp.asarray(batch["labels"]))
            self.state = MLMState(params, opt_state, self.state.step + 1)
            history.append({"loss": float(loss), "accuracy": float(acc)})
            if log_every and (i + 1) % log_every == 0:
                log.info("mlm step %d: loss=%.4f masked-acc=%.3f",
                         self.state.step, history[-1]["loss"],
                         history[-1]["accuracy"])
        return history


def build_ict_pairs(
    passages: Sequence[str],
    seed: int = 0,
    remove_prob: float = 0.9,
    min_sentence_chars: int = 30,
    max_pairs_per_passage: int = 6,
) -> List[Tuple[str, str]]:
    """Inverse Cloze Task pairs: (sentence, passage-without-sentence).

    With probability ``1 - remove_prob`` the sentence stays in the passage
    (ORQA's trick so the model still learns lexical matching when it IS
    present). Passages with fewer than 2 usable sentences are skipped —
    removing the only sentence would leave an empty positive.
    """
    from domain_rag_system_tpu.preprocessing import split_sentences

    rng = np.random.default_rng(seed)
    pairs: List[Tuple[str, str]] = []
    for passage in passages:
        sentences = [s for s in split_sentences(passage)
                     if len(s.strip()) >= min_sentence_chars]
        if len(sentences) < 2:
            continue
        idxs = rng.permutation(len(sentences))[:max_pairs_per_passage]
        for i in idxs:
            query = sentences[i].strip()
            if rng.random() < remove_prob:
                context = " ".join(s for j, s in enumerate(sentences)
                                   if j != i)
            else:
                context = " ".join(sentences)
            pairs.append((query, context))
    return pairs
