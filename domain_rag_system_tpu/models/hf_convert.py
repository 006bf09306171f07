"""HuggingFace BERT checkpoint → Flax parameter conversion.

Lets the framework load the reference's exact models
(``pritamdeka/S-PubMedBert-MS-MARCO``, ``all-MiniLM-L6-v2``,
``cross-encoder/ms-marco-MiniLM-L-6-v2``) from a *local* HF checkpoint
directory — no network required — into the first-party Flax modules of
:mod:`domain_rag_system_tpu.models.bert`.

Conversion is validated (tests/test_bert.py) by comparing our Flax forward
against ``transformers``' torch forward on randomly initialized weights:
identical math ⇒ identical outputs, so downloaded weights, when present,
reproduce sentence-transformers embeddings exactly.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from domain_rag_system_tpu.models.bert import BertConfig
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


def config_from_hf(hf_config: Dict) -> BertConfig:
    return BertConfig(
        vocab_size=hf_config["vocab_size"],
        hidden_size=hf_config["hidden_size"],
        num_layers=hf_config["num_hidden_layers"],
        num_heads=hf_config["num_attention_heads"],
        intermediate_size=hf_config["intermediate_size"],
        max_position_embeddings=hf_config["max_position_embeddings"],
        type_vocab_size=hf_config.get("type_vocab_size", 2),
        layer_norm_eps=hf_config.get("layer_norm_eps", 1e-12),
        dropout_rate=hf_config.get("hidden_dropout_prob", 0.1),
    )


def _strip_prefix(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop the leading 'bert.' / 'model.' wrapper prefixes HF models use."""
    out = {}
    for key, value in state.items():
        for prefix in ("bert.", "model."):
            if key.startswith(prefix):
                key = key[len(prefix):]
        out[key] = value
    return out


def convert_state_dict(
    state: Dict[str, np.ndarray], config: BertConfig
) -> Dict:
    """Torch ``state_dict`` arrays → Flax param tree for our BERT modules.

    Torch ``nn.Linear.weight`` is [out, in]; Flax kernels are [in, out].
    Attention projections additionally reshape to the DenseGeneral head
    layout: qkv kernels [H, heads, head_dim], output kernel
    [heads, head_dim, H].
    """
    state = _strip_prefix({k: np.asarray(v) for k, v in state.items()})
    h, heads = config.hidden_size, config.num_heads
    head_dim = h // heads

    def lin(name: str) -> Tuple[np.ndarray, np.ndarray]:
        return state[f"{name}.weight"].T, state[f"{name}.bias"]

    def ln(name: str) -> Dict[str, np.ndarray]:
        return {"scale": state[f"{name}.weight"], "bias": state[f"{name}.bias"]}

    bert: Dict = {
        "embeddings": {
            "word_embeddings": {"embedding": state["embeddings.word_embeddings.weight"]},
            "position_embeddings": {"embedding": state["embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {"embedding": state["embeddings.token_type_embeddings.weight"]},
            "layer_norm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(config.num_layers):
        prefix = f"encoder.layer.{i}"
        qk, qb = lin(f"{prefix}.attention.self.query")
        kk, kb = lin(f"{prefix}.attention.self.key")
        vk, vb = lin(f"{prefix}.attention.self.value")
        ok, ob = lin(f"{prefix}.attention.output.dense")
        ik, ib = lin(f"{prefix}.intermediate.dense")
        mk, mb = lin(f"{prefix}.output.dense")
        bert[f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": qk.reshape(h, heads, head_dim),
                          "bias": qb.reshape(heads, head_dim)},
                "key": {"kernel": kk.reshape(h, heads, head_dim),
                        "bias": kb.reshape(heads, head_dim)},
                "value": {"kernel": vk.reshape(h, heads, head_dim),
                          "bias": vb.reshape(heads, head_dim)},
                "output": {"kernel": ok.reshape(heads, head_dim, h), "bias": ob},
            },
            "attention_norm": ln(f"{prefix}.attention.output.LayerNorm"),
            "intermediate": {"kernel": ik, "bias": ib},
            "mlp_output": {"kernel": mk, "bias": mb},
            "mlp_norm": ln(f"{prefix}.output.LayerNorm"),
        }

    params: Dict = {"bert": bert}
    if "pooler.dense.weight" in state:
        pk, pb = lin("pooler.dense")
        params["pooler"] = {"kernel": pk, "bias": pb}
    if "classifier.weight" in state:
        ck, cb = lin("classifier")
        params["classifier"] = {"kernel": ck, "bias": cb}
    return params


def load_hf_checkpoint(checkpoint_dir) -> Tuple[BertConfig, Dict, list]:
    """Load (config, flax params, vocab) from a local HF checkpoint dir.

    Supports ``pytorch_model.bin`` (via torch) and ``model.safetensors``.
    """
    ckpt = Path(checkpoint_dir)
    with open(ckpt / "config.json", "r", encoding="utf-8") as f:
        hf_config = json.load(f)
    config = config_from_hf(hf_config)

    state: Dict[str, np.ndarray] = {}
    safetensors_path = ckpt / "model.safetensors"
    torch_path = ckpt / "pytorch_model.bin"
    if safetensors_path.exists():
        from safetensors.numpy import load_file

        state = load_file(str(safetensors_path))
    elif torch_path.exists():
        import torch

        raw = torch.load(str(torch_path), map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in raw.items()}
    else:
        raise FileNotFoundError(f"no weights found in {ckpt}")

    vocab_path = ckpt / "vocab.txt"
    vocab = (vocab_path.read_text(encoding="utf-8").splitlines()
             if vocab_path.exists() else [])
    params = convert_state_dict(state, config)
    log.info("converted HF checkpoint %s (%d layers, hidden %d, vocab %d)",
             ckpt, config.num_layers, config.hidden_size, len(vocab))
    return config, params, vocab
