"""Contrastive dual-encoder training (InfoNCE with in-batch negatives).

The reference has NO training — it downloads S-PubMedBert. Offline, the
framework trains its own domain encoder from scratch on (query, passage)
pairs (e.g. the BioASQ question→snippet pairs recovered by the ETL). The
train step is a single pjit program over a ``("data", "model")`` mesh:

  * batch sharded over ``data`` (per-device sub-batches; gradients
    all-reduce automatically via the SPMD partitioner);
  * parameters sharded over ``model`` per
    :mod:`domain_rag_system_tpu.training.partitioning` (Megatron-style
    column/row splits);
  * loss: symmetric InfoNCE over the full global batch — the similarity
    matrix is computed on replicated embeddings, so in-batch negatives span
    the whole global batch, not just the local shard.

This is also the framework's ``dryrun_multichip`` program (see
``__graft_entry__.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from domain_rag_system_tpu.models.bert import BertConfig, SentenceEncoder
from domain_rag_system_tpu.training.partitioning import partition_params
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class TrainState:
    params: Dict
    opt_state: optax.OptState
    step: int = 0


def infonce_loss(
    q_emb: jax.Array,  # [B, H] L2-normalized query embeddings
    p_emb: jax.Array,  # [B, H] L2-normalized positive-passage embeddings
    temperature: float = 0.05,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric in-batch-negative InfoNCE loss."""
    logits = (q_emb @ p_emb.T) / temperature          # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_p = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = jnp.mean(loss_q + loss_p) / 2.0
    accuracy = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, {"loss": loss, "accuracy": accuracy}


def infonce_loss_with_hards(
    q_emb: jax.Array,   # [B, H]
    p_emb: jax.Array,   # [B, H] positives
    h_emb: jax.Array,   # [B*K, H] hard negatives (K per query, flattened)
    temperature: float = 0.05,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """InfoNCE over [in-batch positives ‖ mined hard negatives].

    Candidates for query i: all B positives (in-batch negatives) plus all
    B·K hard negatives; the label stays the aligned positive i.
    """
    cand = jnp.concatenate([p_emb, h_emb], axis=0)     # [B + B*K, H]
    logits = (q_emb @ cand.T) / temperature            # [B, B + B*K]
    labels = jnp.arange(q_emb.shape[0])
    loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels))
    accuracy = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, {"loss": loss, "accuracy": accuracy}


def make_train_step(
    module: SentenceEncoder,
    optimizer: optax.GradientTransformation,
    temperature: float = 0.05,
) -> Callable:
    """Build the pure (state, batch) → (state, metrics) step function.

    Batches may carry mined hard negatives as ``h_ids``/``h_mask``
    [B·K, L]; the loss then ranks the positive against in-batch AND hard
    candidates (BM25-mined hards are the standard lexical→semantic lever).
    """

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            q_emb = module.apply({"params": p}, batch["q_ids"], batch["q_mask"],
                                 deterministic=True)
            p_emb = module.apply({"params": p}, batch["p_ids"], batch["p_mask"],
                                 deterministic=True)
            if "h_ids" in batch:
                h_emb = module.apply({"params": p}, batch["h_ids"],
                                     batch["h_mask"], deterministic=True)
                return infonce_loss_with_hards(q_emb, p_emb, h_emb, temperature)
            return infonce_loss(q_emb, p_emb, temperature)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


class ContrastiveTrainer:
    """Sharded trainer for the dual encoder."""

    def __init__(
        self,
        config: BertConfig,
        mesh: Optional[Mesh] = None,
        learning_rate: float = 3e-4,
        temperature: float = 0.05,
        seed: int = 0,
        warmup_steps: int = 100,
        total_steps: int = 10_000,
    ):
        self.config = config
        self.mesh = mesh
        self.module = SentenceEncoder(config)
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1))
        self.optimizer = optax.adamw(schedule, weight_decay=0.01)
        self.temperature = temperature
        self._seed = seed
        self._step_fn = None
        self.state: Optional[TrainState] = None

    # ------------------------------------------------------------------ setup

    def init_state(self, seq_len: int = 128,
                   init_params: Optional[Dict] = None) -> TrainState:
        """Fresh random init, or warm-start from ``init_params`` — e.g. the
        ``bert`` subtree of an MLM/ICT pretrain (training/pretrain.py).
        Missing subtrees keep their random init; shapes must match."""
        rng = jax.random.PRNGKey(self._seed)
        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.int32)
        variables = self.module.init(rng, ids, mask)
        params = variables["params"]
        if init_params is not None:
            params = _merge_params(params, init_params)
        opt_state = self.optimizer.init(params)
        self.state = TrainState(params=params, opt_state=opt_state)

        if self.mesh is not None:
            pspecs = partition_params(params, self.mesh)
            sharded = jax.tree_util.tree_map(
                lambda v, s: jax.device_put(v, NamedSharding(self.mesh, s)),
                params, pspecs,
            )
            # Optimizer state mirrors the parameter tree's sharding where the
            # leaves align; scalars stay replicated.
            opt_state = self.optimizer.init(sharded)
            self.state = TrainState(params=sharded, opt_state=opt_state)
        return self.state

    def _build_step(self):
        # Shardings are carried by the arrays themselves (device_put with
        # NamedSharding in init_state / train); jit propagates them and the
        # SPMD partitioner inserts the collectives — no per-arg annotations.
        return jax.jit(make_train_step(self.module, self.optimizer,
                                       self.temperature))

    # ----------------------------------------------------------------- train

    def train(
        self,
        batches: Iterable[Dict[str, np.ndarray]],
        log_every: int = 20,
    ) -> List[Dict[str, float]]:
        if self.state is None:
            self.init_state()
        if self._step_fn is None:
            self._step_fn = self._build_step()

        history = []
        for i, batch in enumerate(batches):
            if self.mesh is not None:
                batch = {
                    k: jax.device_put(
                        jnp.asarray(v),
                        NamedSharding(self.mesh, P("data", None)))
                    for k, v in batch.items()
                }
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, metrics = self._step_fn(
                self.state.params, self.state.opt_state, batch)
            self.state = TrainState(params, opt_state, self.state.step + 1)
            metrics = {k: float(v) for k, v in metrics.items()}
            history.append(metrics)
            if log_every and (i + 1) % log_every == 0:
                log.info("step %d: loss=%.4f acc=%.3f",
                         self.state.step, metrics["loss"], metrics["accuracy"])
        return history


def _merge_params(base: Dict, override: Dict) -> Dict:
    """Recursively overlay ``override`` onto ``base`` (dict leaves only),
    checking array-shape agreement so a geometry mismatch fails loudly."""
    out = dict(base)
    for k, v in override.items():
        if k not in base:
            continue  # e.g. MLM head params not present in SentenceEncoder
        if isinstance(v, dict) and isinstance(base[k], dict):
            out[k] = _merge_params(base[k], v)
        else:
            if hasattr(v, "shape") and hasattr(base[k], "shape") \
                    and tuple(v.shape) != tuple(base[k].shape):
                raise ValueError(
                    f"init param {k!r} shape {tuple(v.shape)} != expected "
                    f"{tuple(base[k].shape)}")
            out[k] = v
    return out


def make_pair_batches(
    tokenizer,
    pairs: List[Tuple[str, str]],
    batch_size: int,
    seq_len: int = 128,
    epochs: int = 1,
    seed: int = 0,
    hard_negatives: "Optional[List[List[str]]]" = None,
    hards_per_query: int = 0,
) -> Iterable[Dict[str, np.ndarray]]:
    """Tokenize (query, passage) pairs into fixed-shape training batches.

    ``hard_negatives[i]`` = candidate negative passages for pair i
    (e.g. BM25 top hits that are not the positive); ``hards_per_query`` of
    them are sampled per example into ``h_ids``/``h_mask`` [B·K, L].
    """
    rng = np.random.default_rng(seed)
    use_hards = hard_negatives is not None and hards_per_query > 0
    for _ in range(epochs):
        order = rng.permutation(len(pairs))
        for start in range(0, len(pairs) - batch_size + 1, batch_size):
            sel = order[start:start + batch_size]
            qs = [pairs[i][0] for i in sel]
            ps = [pairs[i][1] for i in sel]
            q_ids, q_mask, _ = tokenizer.encode_batch(qs, max_length=seq_len)
            p_ids, p_mask, _ = tokenizer.encode_batch(ps, max_length=seq_len)
            batch = {"q_ids": q_ids, "q_mask": q_mask,
                     "p_ids": p_ids, "p_mask": p_mask}
            if use_hards:
                hards: List[str] = []
                for i in sel:
                    pool = hard_negatives[i]
                    if not pool:
                        # no mined negatives for this pair: sample random
                        # NON-positive passages — substituting the positive
                        # itself would cap the pair's loss at log 2 and
                        # distort the accuracy metric.
                        pool = []
                        for _ in range(4 * hards_per_query):
                            j = int(rng.integers(len(pairs)))
                            if pairs[j][1] != pairs[i][1]:
                                pool.append(pairs[j][1])
                                if len(pool) >= hards_per_query:
                                    break
                        pool = pool or [""]  # degenerate single-passage corpus
                    picks = rng.choice(len(pool),
                                       size=hards_per_query,
                                       replace=len(pool) < hards_per_query)
                    hards.extend(pool[j] for j in picks)
                h_ids, h_mask, _ = tokenizer.encode_batch(hards,
                                                          max_length=seq_len)
                batch["h_ids"] = h_ids
                batch["h_mask"] = h_mask
            yield batch
