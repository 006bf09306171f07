"""WordPiece tokenization for the transformer encoders.

The reference gets subword tokenization for free through
sentence-transformers/HF (``src/indexing/embedder.py:40``). Offline, this
module provides both halves first-party:

  * :class:`WordPieceTokenizer` — greedy longest-match-first encoding over an
    HF-format ``vocab.txt`` (one token per line, ``##`` continuation prefix),
    with BERT basic-tokenization (lowercase, punctuation split, CJK isolation)
    so checkpoints converted from HF tokenize identically;
  * :func:`train_wordpiece` — a from-scratch WordPiece vocabulary trainer
    (BPE-style pair merges scored by WordPiece's ``count(ab)/(count(a)count(b))``
    likelihood ratio) for training domain encoders without any downloads.
"""

from __future__ import annotations

import unicodedata
from collections import Counter
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
SPECIAL_TOKENS = [PAD, UNK, CLS, SEP, MASK]


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    """BERT-style basic tokenization: whitespace split + punctuation isolation."""
    if lowercase:
        text = text.lower()
    text = unicodedata.normalize("NFD", text)
    text = "".join(ch for ch in text if unicodedata.category(ch) != "Mn")

    tokens: List[str] = []
    current: List[str] = []
    for ch in text:
        if ch.isspace():
            if current:
                tokens.append("".join(current))
                current = []
        elif _is_punctuation(ch):
            if current:
                tokens.append("".join(current))
                current = []
            tokens.append(ch)
        else:
            current.append(ch)
    if current:
        tokens.append("".join(current))
    return tokens


class WordPieceTokenizer:
    """Greedy longest-match WordPiece encoder with static-shape padding."""

    def __init__(self, vocab: Sequence[str], lowercase: bool = True,
                 max_input_chars_per_word: int = 100):
        self.vocab: List[str] = list(vocab)
        self.token_to_id: Dict[str, int] = {t: i for i, t in enumerate(self.vocab)}
        self.lowercase = lowercase
        self.max_input_chars_per_word = max_input_chars_per_word
        for tok in (PAD, UNK, CLS, SEP):
            if tok not in self.token_to_id:
                raise ValueError(f"vocab is missing required special token {tok}")
        self.pad_id = self.token_to_id[PAD]
        self.unk_id = self.token_to_id[UNK]
        self.cls_id = self.token_to_id[CLS]
        self.sep_id = self.token_to_id[SEP]

    # ------------------------------------------------------------------ io

    @classmethod
    def from_vocab_file(cls, path: str, lowercase: bool = True) -> "WordPieceTokenizer":
        vocab = Path(path).read_text(encoding="utf-8").splitlines()
        return cls([v.rstrip("\n") for v in vocab if v], lowercase=lowercase)

    def save_vocab(self, path: str) -> None:
        Path(path).write_text("\n".join(self.vocab) + "\n", encoding="utf-8")

    def __len__(self) -> int:
        return len(self.vocab)

    # ------------------------------------------------------------- encoding

    def wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_input_chars_per_word:
            return [UNK]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                candidate = word[start:end]
                if start > 0:
                    candidate = "##" + candidate
                if candidate in self.token_to_id:
                    piece = candidate
                    break
                end -= 1
            if piece is None:
                return [UNK]
            pieces.append(piece)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for word in basic_tokenize(text, self.lowercase):
            out.extend(self.wordpiece(word))
        return out

    def encode(
        self,
        text: str,
        text_pair: Optional[str] = None,
        max_length: int = 512,
    ) -> Tuple[List[int], List[int], List[int]]:
        """→ (input_ids, attention_mask, token_type_ids), truncated+padded."""
        tokens_a = self.tokenize(text)
        tokens_b = self.tokenize(text_pair) if text_pair is not None else []

        if text_pair is not None:
            # Longest-first truncation to fit [CLS] a [SEP] b [SEP].
            budget = max_length - 3
            while len(tokens_a) + len(tokens_b) > budget:
                if len(tokens_a) >= len(tokens_b):
                    tokens_a.pop()
                else:
                    tokens_b.pop()
        else:
            tokens_a = tokens_a[: max_length - 2]

        ids = [self.cls_id] + [self.token_to_id.get(t, self.unk_id) for t in tokens_a] + [self.sep_id]
        type_ids = [0] * len(ids)
        if text_pair is not None:
            b_ids = [self.token_to_id.get(t, self.unk_id) for t in tokens_b] + [self.sep_id]
            ids += b_ids
            type_ids += [1] * len(b_ids)

        mask = [1] * len(ids)
        pad_amount = max_length - len(ids)
        ids += [self.pad_id] * pad_amount
        mask += [0] * pad_amount
        type_ids += [0] * pad_amount
        return ids, mask, type_ids

    def encode_batch(
        self,
        texts: Sequence[str],
        text_pairs: Optional[Sequence[str]] = None,
        max_length: int = 512,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        ids, masks, types = [], [], []
        for i, t in enumerate(texts):
            pair = text_pairs[i] if text_pairs is not None else None
            a, m, ty = self.encode(t, pair, max_length)
            ids.append(a)
            masks.append(m)
            types.append(ty)
        return (
            np.asarray(ids, dtype=np.int32),
            np.asarray(masks, dtype=np.int32),
            np.asarray(types, dtype=np.int32),
        )


def train_wordpiece(
    texts: Iterable[str],
    vocab_size: int = 8192,
    min_frequency: int = 2,
    lowercase: bool = True,
) -> WordPieceTokenizer:
    """Train a WordPiece vocabulary from raw text.

    Classic WordPiece training: start from the character alphabet, repeatedly
    merge the adjacent symbol pair maximizing ``count(ab) / (count(a)·count(b))``
    among pairs meeting ``min_frequency``, until ``vocab_size`` is reached.

    Pair/symbol counts are maintained *incrementally* — each merge touches
    only the words containing the merged pair — so training large vocabs on
    a single-core host stays fast (the naive full-recount loop is
    O(vocab_size · corpus)).
    """
    word_counts: Counter = Counter()
    for text in texts:
        word_counts.update(basic_tokenize(text, lowercase))

    # Words as symbol lists: first char bare, continuations ##-prefixed.
    words: List[List[str]] = []
    counts: List[int] = []
    alphabet: set = set()
    for word, count in word_counts.items():
        symbols = [word[0]] + ["##" + c for c in word[1:]]
        words.append(symbols)
        counts.append(count)
        alphabet.update(symbols)

    pair_counts: Counter = Counter()
    symbol_counts: Counter = Counter()
    pair_words: Dict[Tuple[str, str], set] = {}
    for w_idx, symbols in enumerate(words):
        c = counts[w_idx]
        for s in symbols:
            symbol_counts[s] += c
        for pair in zip(symbols, symbols[1:]):
            pair_counts[pair] += c
            pair_words.setdefault(pair, set()).add(w_idx)

    vocab: List[str] = list(SPECIAL_TOKENS) + sorted(alphabet)
    vocab_set = set(vocab)

    def merged_form(a: str, b: str) -> str:
        return a + b[2:] if b.startswith("##") else a + b

    while len(vocab) < vocab_size:
        best_pair, best_score = None, 0.0
        for pair, c in pair_counts.items():
            if c < min_frequency or merged_form(*pair) in vocab_set:
                continue
            score = c / (symbol_counts[pair[0]] * symbol_counts[pair[1]])
            if score > best_score:
                best_pair, best_score = pair, score
        if best_pair is None:
            break

        a, b = best_pair
        merged = merged_form(a, b)
        vocab.append(merged)
        vocab_set.add(merged)

        for w_idx in list(pair_words.get(best_pair, ())):
            symbols = words[w_idx]
            c = counts[w_idx]
            # retract this word's contributions
            for s in symbols:
                symbol_counts[s] -= c
            for pair in zip(symbols, symbols[1:]):
                pair_counts[pair] -= c
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                bucket = pair_words.get(pair)
                if bucket is not None:
                    bucket.discard(w_idx)
                    if not bucket:
                        del pair_words[pair]
            # apply the merge
            out: List[str] = []
            i = 0
            while i < len(symbols):
                if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            words[w_idx] = out
            # re-add contributions
            for s in out:
                symbol_counts[s] += c
            for pair in zip(out, out[1:]):
                pair_counts[pair] += c
                pair_words.setdefault(pair, set()).add(w_idx)

    return WordPieceTokenizer(vocab, lowercase=lowercase)
