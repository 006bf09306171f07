"""BERT-family transformer encoder in Flax.

First-party replacement for the sentence-transformers models the reference
downloads (``src/indexing/embedder.py:21`` S-PubMedBert;
``src/reranker/rerank.py:73`` ms-marco cross-encoder). One module serves
both roles:

  * bi-encoder: mean pooling over valid tokens + L2 norm
    (sentence-transformers semantics, reference ``embedder.py:65-71``);
  * cross-encoder: [CLS] → linear head → single relevance logit.

TPU-first details: bfloat16 compute with fp32 accumulation
(``preferred_element_type``), static padded shapes, optional
``jax.checkpoint`` rematerialization per layer for long-sequence training,
and parameter shapes chosen to map onto the MXU (hidden sizes multiple of
128). Tensor-parallel partitioning of these parameters is defined in
``training/partitioning.py``.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.1
    dtype: str = "float32"          # compute dtype ("bfloat16" on TPU)
    remat: bool = False             # rematerialize layers (training memory)
    # "auto": Pallas flash-attention kernel on TPU when shapes allow
    # (seq multiple of 128), else the einsum path; "einsum"/"flash" force.
    attention_impl: str = "auto"
    # Pre-LN residual blocks (norm INSIDE the residual branch, + final
    # norm after the stack). Original-BERT post-LN stops training past
    # ~8 layers at this scale (measured: 10L/12L MLM plateaus at unigram
    # loss ~4.1 while 8L reaches masked-acc 0.8); pre-LN keeps the
    # residual path identity-clean so depth trains.
    pre_ln: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @classmethod
    def mini(cls, **kw) -> "BertConfig":
        """MiniLM-ish geometry (all-MiniLM-L6-v2: 6 layers, 384 wide)."""
        return cls(hidden_size=384, num_layers=6, num_heads=12,
                   intermediate_size=1536, **kw)

    @classmethod
    def tiny(cls, **kw) -> "BertConfig":
        """Test-scale config."""
        defaults = dict(vocab_size=1024, hidden_size=128, num_layers=2,
                        num_heads=4, intermediate_size=256,
                        max_position_embeddings=128)
        defaults.update(kw)
        return cls(**defaults)


class BertEmbeddings(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool):
        c = self.config
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                        dtype=c.compute_dtype)(input_ids)
        pos_ids = jnp.arange(input_ids.shape[-1])[None, :]
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings", dtype=c.compute_dtype)(pos_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings", dtype=c.compute_dtype)(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm",
                         dtype=c.compute_dtype)(x)
        return nn.Dropout(c.dropout_rate)(x, deterministic=deterministic)


class BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic: bool):
        c = self.config
        head_dim = c.hidden_size // c.num_heads
        dense = lambda name: nn.DenseGeneral(
            (c.num_heads, head_dim), axis=-1, name=name, dtype=c.compute_dtype)
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)

        seq_len = hidden.shape[-2]
        use_flash = c.attention_impl == "flash" or (
            c.attention_impl == "auto"
            and jax.default_backend() == "tpu"
            # measured crossover: at L=128 the einsum path is faster (2.1 vs
            # 2.7 ms/batch); flash avoids the [B,H,L,L] materialization and
            # wins at long sequences
            and seq_len >= 256 and seq_len % 128 == 0
            # flash path has no attention-prob dropout; keep the einsum path
            # when attention dropout must be active
            and (deterministic or c.dropout_rate == 0.0)
        )
        if use_flash:
            # Stock Pallas TPU flash-attention kernel (online softmax, no
            # [B, H, L, L] materialization). Padding is masked via segment
            # ids: real tokens = segment 1, pads = segment 0 — cross-segment
            # attention is disallowed, so real tokens never attend to pads.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds, flash_attention)

            seg = attention_mask.astype(jnp.int32)
            ctx = flash_attention(
                jnp.transpose(q, (0, 2, 1, 3)).astype(c.compute_dtype),
                jnp.transpose(k, (0, 2, 1, 3)).astype(c.compute_dtype),
                jnp.transpose(v, (0, 2, 1, 3)).astype(c.compute_dtype),
                segment_ids=SegmentIds(seg, seg),
                causal=False,
                sm_scale=1.0 / float(head_dim) ** 0.5,
            )
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).astype(c.compute_dtype)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(head_dim).astype(scores.dtype)
            big_neg = jnp.finfo(jnp.float32).min
            scores = jnp.where(attention_mask[:, None, None, :] > 0, scores, big_neg)
            probs = jax.nn.softmax(scores, axis=-1).astype(c.compute_dtype)
            probs = nn.Dropout(c.dropout_rate)(probs, deterministic=deterministic)

            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32).astype(c.compute_dtype)
        out = nn.DenseGeneral(c.hidden_size, axis=(-2, -1), name="output",
                              dtype=c.compute_dtype)(ctx)
        return nn.Dropout(c.dropout_rate)(out, deterministic=deterministic)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic: bool):
        c = self.config
        norm = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=c.layer_norm_eps, name=name, dtype=c.compute_dtype)

        if c.pre_ln:
            attn = BertSelfAttention(c, name="attention")(
                norm("attention_norm")(hidden), attention_mask, deterministic)
            hidden = hidden + attn
            mlp = nn.Dense(c.intermediate_size, name="intermediate",
                           dtype=c.compute_dtype)(norm("mlp_norm")(hidden))
            mlp = nn.gelu(mlp, approximate=False)
            mlp = nn.Dense(c.hidden_size, name="mlp_output",
                           dtype=c.compute_dtype)(mlp)
            mlp = nn.Dropout(c.dropout_rate)(mlp, deterministic=deterministic)
            return hidden + mlp

        attn = BertSelfAttention(c, name="attention")(
            hidden, attention_mask, deterministic)
        hidden = norm("attention_norm")(hidden + attn)

        mlp = nn.Dense(c.intermediate_size, name="intermediate",
                       dtype=c.compute_dtype)(hidden)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = nn.Dense(c.hidden_size, name="mlp_output",
                       dtype=c.compute_dtype)(mlp)
        mlp = nn.Dropout(c.dropout_rate)(mlp, deterministic=deterministic)
        return norm("mlp_norm")(hidden + mlp)


class BertEncoder(nn.Module):
    """Token ids → contextual hidden states [B, L, H]."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic: bool = True):
        c = self.config
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = BertEmbeddings(c, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        # deterministic (arg 3, counting self) must stay a static Python
        # bool under remat — Dropout branches on it (`if deterministic`),
        # and the default remat tracing turns it into a tracer
        layer_cls = (nn.remat(BertLayer, static_argnums=(3,))
                     if c.remat else BertLayer)
        for i in range(c.num_layers):
            x = layer_cls(c, name=f"layer_{i}")(x, attention_mask, deterministic)
        if c.pre_ln:  # pre-LN stacks need one final norm after the residuals
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_norm",
                             dtype=c.compute_dtype)(x)
        return x


def mean_pool(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Masked mean over tokens (sentence-transformers pooling semantics)."""
    mask = attention_mask[..., None].astype(hidden.dtype)
    summed = jnp.sum(hidden * mask, axis=-2)
    counts = jnp.maximum(jnp.sum(mask, axis=-2), 1e-9)
    return summed / counts


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class SentenceEncoder(nn.Module):
    """Bi-encoder: token ids → L2-normalized sentence embedding [B, H]."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic: bool = True):
        hidden = BertEncoder(self.config, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic)
        pooled = mean_pool(hidden, attention_mask)
        return l2_normalize(pooled.astype(jnp.float32))


class CrossEncoder(nn.Module):
    """(query, passage) pair ids → single relevance logit [B]."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic: bool = True):
        hidden = BertEncoder(self.config, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic)
        cls = hidden[:, 0, :].astype(jnp.float32)
        # BERT pooler: dense+tanh over [CLS], then the classifier head.
        pooled = jnp.tanh(nn.Dense(self.config.hidden_size, name="pooler")(cls))
        logit = nn.Dense(1, name="classifier")(pooled)
        return logit[..., 0]
