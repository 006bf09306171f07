"""Deterministic lexical-hash dense embedder.

The reference's dense encoder is a downloaded SentenceTransformer
(``pritamdeka/S-PubMedBert-MS-MARCO``, ``src/indexing/embedder.py:21``).
This environment has no network and no weight cache, so the framework needs
a dense embedder that works from *nothing but the corpus*:

Feature-hashed TF-IDF ("hashing vectorizer") with signed buckets:

  * features = word tokens (BM25-parity tokenizer) + boundary-marked char
    4-grams (morphological robustness for biomedical terms);
  * each feature hashes to a bucket ``h(f) mod dim`` with a pseudo-random
    sign s(f) ∈ {±1} (signs make collisions cancel in expectation);
  * weight = ``(1 + log tf) · idf`` with smooth IDF fit on the corpus;
  * embedding = L2-normalized signed sum → cosine works like any dense model.

This is a *lexical* dense model — no semantics beyond surface forms — but it
runs through exactly the same device pipeline (HBM matrix, MXU matmul
scoring, top-k, fusion) as a learned encoder, and it is the fallback the
learned encoders degrade to (mirroring the reference's
S-PubMedBert→MiniLM fallback at ``embedder.py:44-48``).

Hashes are CRC32-based and content-only: index and queries agree across
processes and machines with no stored vocabulary.
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from domain_rag_system_tpu.tokenization import RegexTokenizer
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

_SIGN_SALT = b"drs-sign-v1:"
_BUCKET_SALT = b"drs-bucket-v1:"


def _bucket(feature: str, dim: int) -> int:
    return zlib.crc32(_BUCKET_SALT + feature.encode()) % dim


def _sign(feature: str) -> float:
    return 1.0 if zlib.crc32(_SIGN_SALT + feature.encode()) & 1 else -1.0


class LexicalHashEmbedder:
    """Corpus-fit, deterministic, download-free dense embedder."""

    name = "lexical-hash"

    def __init__(
        self,
        dim: int = 2048,
        char_ngrams: int = 4,
        tokenizer: Optional[RegexTokenizer] = None,
    ):
        self.dim = dim
        self.char_ngrams = char_ngrams
        self.tokenizer = tokenizer or RegexTokenizer()
        self._idf: Optional[np.ndarray] = None  # [dim], bucket-level idf
        self._n_fit_docs = 0
        # Per-token feature cache: token → (buckets[int32], signed_weights[f32]).
        # Vocabulary is small (~10k terms) while corpora re-use tokens heavily;
        # caching turns the per-feature Python/crc work into one dict hit per
        # token (this host is single-core — the Python featurization loop was
        # the index-build bottleneck).
        self._token_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    def _token_features(self, token: str) -> Tuple[np.ndarray, np.ndarray]:
        cached = self._token_cache.get(token)
        if cached is not None:
            return cached
        buckets: List[int] = []
        weights: List[float] = []
        feats: List[Tuple[str, float]] = [(token, 1.0)]
        if self.char_ngrams and len(token) > self.char_ngrams:
            padded = f"<{token}>"
            n = self.char_ngrams
            feats.extend(("#" + padded[i:i + n], 0.5)
                         for i in range(len(padded) - n + 1))
        for feature, base_w in feats:
            buckets.append(_bucket(feature, self.dim))
            weights.append(_sign(feature) * base_w)
        out = (np.asarray(buckets, dtype=np.int32),
               np.asarray(weights, dtype=np.float32))
        self._token_cache[token] = out
        return out

    @property
    def embedding_dim(self) -> int:
        return self.dim

    # ------------------------------------------------------------------- fit

    def _text_arrays(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        """All hashed features of ``text`` → (buckets, signed base weights)."""
        tokens = self.tokenizer.tokenize(text)
        if not tokens:
            empty = np.zeros(0, dtype=np.int32)
            return empty, np.zeros(0, dtype=np.float32)
        parts = [self._token_features(t) for t in tokens]
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))

    def fit(self, texts: Sequence[str]) -> "LexicalHashEmbedder":
        """Fit bucket-level smooth IDF: idf = ln((1+N)/(1+df)) + 1."""
        df = np.zeros(self.dim, dtype=np.int64)
        for text in texts:
            ids, _ = self._text_arrays(text)
            df[np.unique(ids)] += 1
        n = len(texts)
        self._idf = (np.log((1.0 + n) / (1.0 + df)) + 1.0).astype(np.float32)
        self._n_fit_docs = n
        log.info("hash embedder fit on %d docs (dim=%d, %.1f%% buckets seen)",
                 n, self.dim, 100.0 * (df > 0).mean())
        return self

    @property
    def is_fit(self) -> bool:
        return self._idf is not None

    # ---------------------------------------------------------------- encode

    def encode(
        self,
        texts,
        normalize: bool = True,
        batch_size: int = 0,  # unused; kept for API parity
    ) -> np.ndarray:
        """Encode text(s) → [B, dim] f32 (L2-normalized by default)."""
        if isinstance(texts, str):
            texts = [texts]
        if self._idf is None:
            # Un-fit embedder: uniform idf (still deterministic).
            idf = np.ones(self.dim, dtype=np.float32)
        else:
            idf = self._idf

        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for row, text in enumerate(texts):
            ids, ws = self._text_arrays(text)
            if ids.size == 0:
                continue
            # Signed bucket accumulation, then sublinear (1+log|v|) scaling —
            # order-independent and fully vectorized.
            v = np.bincount(ids, weights=ws, minlength=self.dim)
            nz = v != 0
            out[row, nz] = (np.sign(v[nz]) * (1.0 + np.log(np.abs(v[nz])))
                            * idf[nz]).astype(np.float32)
        if normalize:
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            np.divide(out, norms, out=out, where=norms > 0)
        return out

    def encode_chunks(self, chunks, normalize: bool = True) -> np.ndarray:
        return self.encode([c.text for c in chunks], normalize=normalize)

    def get_model_info(self) -> Dict:
        return {
            "model_name": self.name,
            "embedding_dim": self.dim,
            "char_ngrams": self.char_ngrams,
            "fit_docs": self._n_fit_docs,
        }

    # ------------------------------------------------------------- persist

    def state_arrays(self) -> Dict[str, np.ndarray]:
        return {
            "idf": self._idf if self._idf is not None else np.ones(self.dim, np.float32),
            "meta": np.array([self.dim, self.char_ngrams, self._n_fit_docs], np.int64),
        }

    @classmethod
    def from_state_arrays(cls, arrays: Dict[str, np.ndarray]) -> "LexicalHashEmbedder":
        dim, char_ngrams, n_fit = (int(x) for x in arrays["meta"])
        emb = cls(dim=dim, char_ngrams=char_ngrams)
        emb._idf = arrays["idf"].astype(np.float32)
        emb._n_fit_docs = n_fit
        return emb
