"""Model checkpointing: flax param trees ↔ flat npz + JSON config.

No pickle (cf. persistence/bundle.py). A checkpoint directory holds:

    params.npz   — flattened param tree, '/'-joined keys
    config.json  — BertConfig fields
    vocab.txt    — WordPiece vocabulary (one token per line)
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, Tuple

import jax
import numpy as np

from domain_rag_system_tpu.models.bert import BertConfig
from domain_rag_system_tpu.tokenization import WordPieceTokenizer
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


def flatten_params(params: Dict) -> Dict[str, np.ndarray]:
    flat = {}
    for path, value in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(getattr(k, "key", str(k)) for k in path)
        flat[key] = np.asarray(value)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_encoder_checkpoint(
    out_dir,
    config: BertConfig,
    params: Dict,
    tokenizer: WordPieceTokenizer,
) -> Path:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out / "params.npz", **flatten_params(params))
    with open(out / "config.json", "w", encoding="utf-8") as f:
        json.dump(dataclasses.asdict(config), f, indent=2)
    tokenizer.save_vocab(str(out / "vocab.txt"))
    log.info("saved encoder checkpoint to %s", out)
    return out


def load_encoder_checkpoint(ckpt_dir) -> Tuple[BertConfig, Dict, WordPieceTokenizer]:
    ckpt = Path(ckpt_dir)
    with open(ckpt / "config.json", "r", encoding="utf-8") as f:
        config = BertConfig(**json.load(f))
    data = np.load(ckpt / "params.npz", allow_pickle=False)
    params = unflatten_params({k: data[k] for k in data.files})
    tokenizer = WordPieceTokenizer.from_vocab_file(str(ckpt / "vocab.txt"))
    log.info("loaded encoder checkpoint from %s", ckpt)
    return config, params, tokenizer


def extend_position_embeddings(
    trunk_params: Dict, config: BertConfig, new_len: int
) -> Tuple[Dict, BertConfig]:
    """Extend a trunk's learned absolute-position table to ``new_len`` by
    tiling (positions beyond the trained range repeat the learned table).

    Every transformer layer transfers unchanged, so a short-context trunk
    (e.g. the 64-position bi-encoder) can initialize a longer-context
    cross-encoder — the round-2 CE's quality ceiling was exactly this
    truncation (a 64-position CE reads only ~40 passage tokens of a
    512-char chunk). Tiled positions fine-tune quickly.

    ``trunk_params`` is the BERT subtree (containing ``embeddings``);
    returns (updated copy, updated config).
    """
    if new_len <= config.max_position_embeddings:
        return trunk_params, config
    out = dict(trunk_params)
    emb = dict(out["embeddings"])
    table = np.asarray(emb["position_embeddings"]["embedding"])
    reps = -(-new_len // table.shape[0])
    emb["position_embeddings"] = {
        "embedding": np.tile(table, (reps, 1))[:new_len]}
    out["embeddings"] = emb
    log.info("extended position table %d -> %d",
             table.shape[0], new_len)
    return out, dataclasses.replace(config, max_position_embeddings=new_len)
