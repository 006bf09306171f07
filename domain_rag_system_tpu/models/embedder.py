"""Unified embedder facade.

API parity with the reference ``MedicalEmbedder``
(``src/indexing/embedder.py:8-97``): ``encode`` / ``encode_chunks`` /
``get_model_info`` / ``embedding_dim``, batch encoding, L2 normalization.

Backends:
  * ``"hash"``  — :class:`LexicalHashEmbedder` (deterministic, offline,
    corpus-fit TF-IDF hashing). Always available.
  * ``"bert"``  — Flax transformer dual encoder
    (:mod:`domain_rag_system_tpu.models.bert`) with mean pooling + L2 norm
    (sentence-transformers semantics, reference ``embedder.py:65-71``);
    parameters come from a local converted HF checkpoint or from-scratch
    contrastive training. If construction fails (no params available), the
    facade degrades to the hash backend — the same graceful-degradation
    pattern the reference uses for S-PubMedBert→MiniLM
    (``embedder.py:44-48``) — and logs the degradation explicitly.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from domain_rag_system_tpu.models.hash_embedder import LexicalHashEmbedder
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

#: Model-zoo names the reference documents (embedder.py:12-19) mapped to
#: backend kinds. Any unknown name falls back to "hash" unless a checkpoint
#: path is supplied.
KNOWN_BERT_MODELS = {
    "pritamdeka/S-PubMedBert-MS-MARCO": 768,
    "sentence-transformers/all-MiniLM-L6-v2": 384,
    "sentence-transformers/all-mpnet-base-v2": 768,
}


class MedicalEmbedder:
    """Facade choosing a concrete embedding backend."""

    def __init__(
        self,
        model_name: str = "lexical-hash",
        backend: Optional[str] = None,
        checkpoint_path: Optional[str] = None,
        dim: int = 2048,
        batch_size: int = 32,
        max_length: int = 512,
        stack=None,  # [(checkpoint, weight), ...] → stacked multi-encoder
    ):
        self.model_name = model_name
        self.batch_size = batch_size
        self.max_length = max_length
        self.checkpoint_path = checkpoint_path  # recorded in index bundles
        self.stack = list(stack) if stack else None

        if backend is None:
            backend = ("stacked" if stack
                       else "bert" if (checkpoint_path
                                       or model_name in KNOWN_BERT_MODELS)
                       else "hash")

        self._impl = None
        if backend == "stacked":
            try:
                from domain_rag_system_tpu.models.stacked_embedder import (
                    StackedBertEmbedder,
                )

                self._impl = StackedBertEmbedder(stack, batch_size=batch_size)
                self.model_name = self._impl.model_name
            except Exception as exc:  # degradation, reference-style
                log.warning(
                    "stacked backend unavailable (%s) — degrading to "
                    "lexical-hash embedder", exc,
                )
        elif backend == "bert":
            try:
                from domain_rag_system_tpu.models.bert_embedder import BertEmbedder

                self._impl = BertEmbedder(
                    model_name=model_name,
                    checkpoint_path=checkpoint_path,
                    max_length=max_length,
                    batch_size=batch_size,
                )
            except Exception as exc:  # degradation, reference-style
                log.warning(
                    "BERT backend unavailable for %r (%s) — degrading to "
                    "lexical-hash embedder", model_name, exc,
                )
        if self._impl is None:
            self._impl = LexicalHashEmbedder(dim=dim)

    # ------------------------------------------------------------ delegation

    @property
    def backend_name(self) -> str:
        return type(self._impl).__name__

    @property
    def embedding_dim(self) -> int:
        return self._impl.embedding_dim

    def fit(self, texts: Sequence[str]) -> "MedicalEmbedder":
        """Corpus-statistics fit (no-op for learned backends)."""
        if hasattr(self._impl, "fit"):
            self._impl.fit(texts)
        return self

    def encode(self, texts, normalize: bool = True) -> np.ndarray:
        return self._impl.encode(texts, normalize=normalize)

    def encode_device(self, texts):
        """Device-resident encode (no host pull) when the backend supports
        it; falls back to a host encode + one upload."""
        if hasattr(self._impl, "encode_device"):
            return self._impl.encode_device(texts)
        import jax.numpy as jnp

        return jnp.asarray(self._impl.encode(texts, normalize=True))

    def program_encoder(self):
        """(module, params) for in-program fused encode, or None when the
        backend has no jittable forward (lexical hash)."""
        f = getattr(self._impl, "program_encoder", None)
        return f() if f is not None else None

    def tokenize_ids(self, texts):
        return self._impl.tokenize_ids(texts)

    def encode_chunks(self, chunks, normalize: bool = True) -> np.ndarray:
        return self._impl.encode([c.text for c in chunks], normalize=normalize)

    def get_model_info(self) -> Dict:
        info = self._impl.get_model_info()
        info["requested_model"] = self.model_name
        info["backend"] = self.backend_name
        return info
