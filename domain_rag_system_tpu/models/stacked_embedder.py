"""Stacked multi-encoder dense arm: one index, several encoders.

The dense index stores ``concat_i(w_i · e_i(text))`` rows, where each
``e_i`` is an independently trained L2-normalized sentence encoder.
Because the dot product distributes over concatenation,

    score(q, c) = Σ_i w_i² · cos_i(q, c)

— a weighted ensemble of encoder cosines — with ZERO changes to the
retrieval pipeline: dense scoring stays one [N, Σd_i] matmul, and the
weighted fusion's min-max normalization removes the global scale, so
only the weight RATIOS affect rankings. This is the TPU-first answer to
"ensemble two dense retrievers": stack the embedding spaces instead of
running two indexes and merging result lists on the host (the reference
runs exactly one dense model — ``src/indexing/embedder.py:21``; an
ensemble has no reference counterpart).

Used by the quality profiles to combine the contrastive 4L/256 encoder
(`medrag-sem`) with the MLM+ICT-pretrained 6L/384 encoder
(`medrag-pre-6l`) — decorrelated training recipes whose errors partially
cancel (measured: results/stack_sweep*.json).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from domain_rag_system_tpu.models.bert import BertConfig, SentenceEncoder
from domain_rag_system_tpu.models.bert_embedder import BertEmbedder
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


class StackedSentenceEncoder(nn.Module):
    """Token ids for K encoders (stacked on the batch axis: [K·B, L])
    → concatenated weighted embeddings [B, Σd_i].

    Each block of B rows was tokenized with the matching encoder's OWN
    vocabulary (the sub-encoders need not share a WordPiece table)."""

    configs: Tuple[BertConfig, ...]
    weights: Tuple[float, ...]

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic: bool = True):
        k = len(self.configs)
        b = input_ids.shape[0] // k
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        outs = []
        for i, cfg in enumerate(self.configs):
            sl = slice(i * b, (i + 1) * b)
            emb = SentenceEncoder(cfg, name=f"enc{i}")(
                input_ids[sl], attention_mask[sl], token_type_ids[sl],
                deterministic)
            outs.append(jnp.float32(self.weights[i]) * emb)
        return jnp.concatenate(outs, axis=-1)


class StackedBertEmbedder:
    """Drop-in embedder whose vectors are the weighted concat of several
    Flax bi-encoders (each with its own checkpoint, config and tokenizer).
    Exposes the same surface as :class:`BertEmbedder` — ``encode``,
    ``encode_device``, ``tokenize_ids`` and ``program_encoder`` — so the
    fused retrieval program runs ALL stacked forwards in one dispatch."""

    def __init__(
        self,
        stack: Sequence[Tuple[str, float]],  # (checkpoint_path, weight)
        batch_size: int = 32,
    ):
        if not stack:
            raise ValueError("stack needs at least one (checkpoint, weight)")
        self.stack = [(str(p), float(w)) for p, w in stack]
        self.parts = [BertEmbedder(checkpoint_path=p, batch_size=batch_size)
                      for p, _ in self.stack]
        self.batch_size = batch_size
        # common token budget: every block must fit the smallest position
        # table (queries are far shorter than any of these in practice)
        self.max_length = min(p.max_length for p in self.parts)
        self.model_name = "+".join(
            f"{ckpt.rstrip('/').rsplit('/', 1)[-1]}x{w:g}"
            for ckpt, w in self.stack)
        self._module = StackedSentenceEncoder(
            configs=tuple(p.config for p in self.parts),
            weights=tuple(w for _, w in self.stack))
        self._params = jax.device_put({"params": {
            f"enc{i}": p.params["params"]
            for i, p in enumerate(self.parts)}})

    @property
    def embedding_dim(self) -> int:
        return sum(p.embedding_dim for p in self.parts)

    @property
    def config(self):  # buckets/length probes look at .config on BertEmbedder
        return self.parts[0].config

    def encode(self, texts, normalize: bool = True) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        blocks = [w * p.encode(texts, normalize=True)
                  for p, (_, w) in zip(self.parts, self.stack)]
        return np.concatenate(blocks, axis=1)

    def encode_device(self, texts) -> jax.Array:
        blocks = [jnp.float32(w) * p.encode_device(texts)
                  for p, (_, w) in zip(self.parts, self.stack)]
        return jnp.concatenate(blocks, axis=1)

    def encode_chunks(self, chunks, normalize: bool = True) -> np.ndarray:
        return self.encode([c.text for c in chunks], normalize=normalize)

    def tokenize_ids(self, texts: Sequence[str]) -> np.ndarray:
        """[K·B, L] token ids: per-encoder tokenizations (own vocab each)
        stacked on the batch axis at a common bucketed length."""
        per = [p.tokenize_ids(list(texts))[:, : self.max_length]
               for p in self.parts]
        width = max(ids.shape[1] for ids in per)
        per = [np.pad(ids, ((0, 0), (0, width - ids.shape[1])))
               if ids.shape[1] < width else ids for ids in per]
        return np.concatenate(per, axis=0)

    def program_encoder(self):
        """(module, device params) for in-program fused encode — the
        stacked forward (every sub-encoder) runs inside the same jit as
        retrieval, exactly like the single-encoder path."""
        return self._module, self._params

    def get_model_info(self) -> Dict:
        return {
            "model_name": self.model_name,
            "embedding_dim": self.embedding_dim,
            "num_layers": [p.config.num_layers for p in self.parts],
            "max_length": self.max_length,
            "stack": self.stack,
        }
