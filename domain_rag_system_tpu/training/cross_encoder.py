"""Cross-encoder relevance training.

Makes the ``crossencoder`` reranker kind functional without downloads: the
Flax :class:`~domain_rag_system_tpu.models.bert.CrossEncoder` is trained on
(query, passage) pairs with sampled negatives — positives are aligned pairs
(title ↔ abstract/sentence), negatives are passages of other pairs.

Two objectives:
  * grouped softmax (default in the CLI): listwise 1-of-K ranking over
    [positive, negatives] groups — required from scratch (pointwise
    training collapses to uniform logits);
  * pointwise sigmoid BCE (``group_size=0``) — fine-tuning a pretrained
    trunk.

From-scratch cross-attention still collapses even listwise; initialize the
trunk from a contrastively trained bi-encoder
(``scripts/train_cross_encoder.py --init_from``).

Shares the mesh story of the dual-encoder trainer (batch on ``data``,
parameters Megatron-partitioned on ``model``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from domain_rag_system_tpu.models.bert import BertConfig, CrossEncoder
from domain_rag_system_tpu.training.partitioning import partition_params
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class CrossTrainState:
    params: Dict
    opt_state: optax.OptState
    step: int = 0


def bce_loss(logits: jax.Array, labels: jax.Array) -> Tuple[jax.Array, Dict]:
    """Sigmoid binary cross-entropy over relevance logits [B]."""
    loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))
    accuracy = jnp.mean((logits > 0) == (labels > 0.5))
    return loss, {"loss": loss, "accuracy": accuracy}


def grouped_softmax_loss(
    logits: jax.Array, group_size: int
) -> Tuple[jax.Array, Dict]:
    """Listwise ranking loss: each group is [positive, negatives...]; the
    positive (slot 0) must win the softmax. Far stronger training signal
    than pointwise BCE when token embeddings start from scratch."""
    groups = logits.reshape(-1, group_size)
    labels = jnp.zeros(groups.shape[0], jnp.int32)
    loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(groups, labels))
    accuracy = jnp.mean(jnp.argmax(groups, axis=1) == 0)
    return loss, {"loss": loss, "accuracy": accuracy}


def listwise_distill_loss(
    logits: jax.Array,          # [B·G] CE relevance logits
    teacher_scores: jax.Array,  # [B·G] tuned-stack fused scores (-inf = pad)
    group_size: int,
    temperature: float = 1.0,
    gt_slots: Optional[jax.Array] = None,  # [B] source-chunk slot, -1 = none
    gt_weight: float = 0.0,
) -> Tuple[jax.Array, Dict]:
    """KL(teacher ‖ student) over candidate lists — ranking distillation.

    The teacher is the tuned fusion+PRF+evidence ranking (corpus-only
    pseudo-queries, no eval leakage — VERDICT round-2 item 4): per query
    group, teacher scores are z-normalized then softmaxed at
    ``temperature``; the CE's softmax must match. Padding slots carry
    ``-inf`` teacher scores and are excluded from both distributions.
    Reported accuracy = how often the CE's argmax equals the teacher's.

    ``gt_slots``/``gt_weight`` add supervision the teacher DOESN'T have:
    for ICT pseudo-queries the source chunk is known ground truth by
    construction, so a softmax cross-entropy term pushes it to the top of
    the group even when the fusion teacher ranks it lower — the one signal
    that can let the student exceed its teacher (groups with no source
    chunk in the candidate pool carry slot -1 and contribute 0).
    """
    s = logits.reshape(-1, group_size)
    t = teacher_scores.reshape(-1, group_size)
    valid = jnp.isfinite(t)
    # z-normalize valid teacher scores per group (fusion scores are on an
    # arbitrary per-query scale; the RANKING is the supervision signal)
    cnt = jnp.maximum(valid.sum(axis=1, keepdims=True), 1)
    mean = jnp.where(valid, t, 0.0).sum(axis=1, keepdims=True) / cnt
    var = (jnp.where(valid, (t - mean) ** 2, 0.0).sum(axis=1, keepdims=True)
           / cnt)
    t_norm = (t - mean) / jnp.sqrt(var + 1e-6)
    neg = jnp.float32(-1e30)
    t_logits = jnp.where(valid, t_norm / temperature, neg)
    s_logits = jnp.where(valid, s, neg)
    t_prob = jax.nn.softmax(t_logits, axis=1)
    log_s = jax.nn.log_softmax(s_logits, axis=1)
    log_t = jax.nn.log_softmax(t_logits, axis=1)
    kl = jnp.sum(jnp.where(valid, t_prob * (log_t - log_s), 0.0), axis=1)
    loss = jnp.mean(kl)
    accuracy = jnp.mean(jnp.argmax(s_logits, axis=1)
                        == jnp.argmax(t_logits, axis=1))
    metrics = {"loss": loss, "accuracy": accuracy}
    if gt_slots is not None and gt_weight > 0.0:
        has_gt = gt_slots >= 0
        safe = jnp.maximum(gt_slots, 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(s_logits, safe)
        n_gt = jnp.maximum(has_gt.sum(), 1)
        gt_loss = jnp.where(has_gt, ce, 0.0).sum() / n_gt
        loss = loss + gt_weight * gt_loss
        gt_acc = (jnp.where(has_gt, jnp.argmax(s_logits, axis=1) == safe,
                            False).sum() / n_gt)
        metrics = {"loss": loss, "accuracy": accuracy,
                   "gt_loss": gt_loss, "gt_accuracy": gt_acc}
    return loss, metrics


def make_cross_train_step(
    module: CrossEncoder,
    optimizer: optax.GradientTransformation,
    group_size: int = 0,
    distill: bool = False,
    temperature: float = 1.0,
    gt_weight: float = 0.0,
) -> Callable:
    """``distill`` → listwise KL against ``batch['teacher']`` scores
    (plus a ground-truth softmax term on ``batch['gt']`` slots when
    ``gt_weight > 0``); else ``group_size > 0`` → grouped softmax ranking
    loss (batches laid out as [pos, neg...] groups); else pointwise BCE
    on ``batch['labels']``."""

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            logits = module.apply({"params": p}, batch["ids"], batch["mask"],
                                  batch["types"], deterministic=True)
            if distill:
                return listwise_distill_loss(logits, batch["teacher"],
                                             group_size, temperature,
                                             gt_slots=batch.get("gt"),
                                             gt_weight=gt_weight)
            if group_size > 0:
                return grouped_softmax_loss(logits, group_size)
            return bce_loss(logits, batch["labels"])

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


class CrossEncoderTrainer:
    """Pointwise relevance trainer for the cross-encoder."""

    def __init__(
        self,
        config: BertConfig,
        mesh: Optional[Mesh] = None,
        learning_rate: float = 3e-4,
        seed: int = 0,
        warmup_steps: int = 50,
        total_steps: int = 5_000,
        group_size: int = 0,
        distill: bool = False,
        temperature: float = 1.0,
        gt_weight: float = 0.0,
    ):
        self.group_size = group_size
        self.distill = distill
        self.temperature = temperature
        self.gt_weight = gt_weight
        self.config = config
        self.mesh = mesh
        self.module = CrossEncoder(config)
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1))
        self.optimizer = optax.adamw(schedule, weight_decay=0.01)
        self._seed = seed
        self._step_fn = None
        self.state: Optional[CrossTrainState] = None

    def init_state(self, seq_len: int = 128,
                   init_params: Optional[Dict] = None) -> CrossTrainState:
        rng = jax.random.PRNGKey(self._seed)
        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.int32)
        params = self.module.init(rng, ids, mask, jnp.zeros_like(ids))["params"]
        if init_params is not None:
            from domain_rag_system_tpu.training.contrastive import _merge_params

            params = _merge_params(params, init_params)
        if self.mesh is not None:
            pspecs = partition_params(params, self.mesh)
            params = jax.tree_util.tree_map(
                lambda v, s: jax.device_put(v, NamedSharding(self.mesh, s)),
                params, pspecs)
        self.state = CrossTrainState(params, self.optimizer.init(params))
        return self.state

    def train(self, batches: Iterable[Dict[str, np.ndarray]],
              log_every: int = 20) -> List[Dict[str, float]]:
        if self.state is None:
            self.init_state()
        if self._step_fn is None:
            self._step_fn = jax.jit(
                make_cross_train_step(self.module, self.optimizer,
                                      self.group_size, self.distill,
                                      self.temperature, self.gt_weight))
        history = []
        for i, batch in enumerate(batches):
            if self.mesh is not None:
                spec = lambda v: NamedSharding(
                    self.mesh, P("data", *([None] * (v.ndim - 1))))
                batch = {k: jax.device_put(jnp.asarray(v), spec(jnp.asarray(v)))
                         for k, v in batch.items()}
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, metrics = self._step_fn(
                self.state.params, self.state.opt_state, batch)
            self.state = CrossTrainState(params, opt_state, self.state.step + 1)
            metrics = {k: float(v) for k, v in metrics.items()}
            history.append(metrics)
            if log_every and (i + 1) % log_every == 0:
                log.info("step %d: loss=%.4f acc=%.3f",
                         self.state.step, metrics["loss"], metrics["accuracy"])
        return history


def make_relevance_batches(
    tokenizer,
    pairs: List[Tuple[str, str]],
    batch_size: int,
    seq_len: int = 128,
    negatives_per_positive: int = 1,
    epochs: int = 1,
    seed: int = 0,
    hard_negatives: "Optional[List[List[str]]]" = None,
    hard_fraction: float = 0.5,
) -> Iterable[Dict[str, np.ndarray]]:
    """(query, passage) pairs → (pair-encoded ids, binary labels) batches.

    Each positive pair contributes ``negatives_per_positive`` negatives.
    Without mined pools, negatives are random cross-pair passages — too
    easy for a reranker that must separate near-duplicates. With
    ``hard_negatives[i]`` (e.g. BM25 top hits that are not the positive),
    ``hard_fraction`` of each pair's negatives come from its pool.
    """
    rng = np.random.default_rng(seed)
    n_pos = max(batch_size // (1 + negatives_per_positive), 1)

    def random_negative(i: int) -> str:
        j = int(rng.integers(0, len(pairs)))
        while j == i:
            j = int(rng.integers(0, len(pairs)))
        return pairs[j][1]

    for _ in range(epochs):
        order = rng.permutation(len(pairs))
        for start in range(0, len(pairs) - n_pos + 1, n_pos):
            sel = order[start:start + n_pos]
            queries, passages, labels = [], [], []
            for i in sel:
                queries.append(pairs[i][0])
                passages.append(pairs[i][1])
                labels.append(1.0)
                pool = hard_negatives[i] if hard_negatives else []
                pool = [p for p in pool if p != pairs[i][1]]
                for n_idx in range(negatives_per_positive):
                    if pool and rng.random() < hard_fraction:
                        neg = pool[int(rng.integers(len(pool)))]
                    else:
                        neg = random_negative(i)
                    queries.append(pairs[i][0])
                    passages.append(neg)
                    labels.append(0.0)
            # pad with whole duplicate GROUPS so grouped-softmax layouts
            # stay aligned (duplicated groups just repeat a valid example)
            group = 1 + negatives_per_positive
            while len(queries) < batch_size:
                queries.extend(queries[-group:])
                passages.extend(passages[-group:])
                labels.extend(labels[-group:])
            ids, mask, types = tokenizer.encode_batch(
                queries[:batch_size], passages[:batch_size], max_length=seq_len)
            yield {"ids": ids, "mask": mask, "types": types,
                   "labels": np.asarray(labels[:batch_size], np.float32)}
