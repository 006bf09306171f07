#!/usr/bin/env python
"""Train the cross-encoder reranker from scratch (no downloads).

Positives: title ↔ abstract/sentence alignment pairs; negatives: sampled
cross-pair passages. The resulting checkpoint powers the ``crossencoder``
reranker kind (reranker/rerank.py) via --cross_checkpoint.

Usage:
    python scripts/train_cross_encoder.py --steps 300 --out checkpoints/medrag-cross
"""

import argparse
import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from domain_rag_system_tpu.models.bert import BertConfig  # noqa: E402
from domain_rag_system_tpu.persistence.checkpoints import (  # noqa: E402
    save_encoder_checkpoint,
)
from domain_rag_system_tpu.tokenization import train_wordpiece  # noqa: E402
from domain_rag_system_tpu.training.cross_encoder import (  # noqa: E402
    CrossEncoderTrainer,
    make_relevance_batches,
)

import jax  # noqa: E402

from train_encoder import build_pairs, mine_hard_negatives  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default="data/recovered/BioASQ/corpus_subset.json")
    ap.add_argument("--out", default="checkpoints/medrag-cross")
    ap.add_argument("--vocab_size", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--seq_len", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--negatives", type=int, default=3)
    ap.add_argument("--pair_style", default="title",
                    choices=["title", "keyword", "question", "semantic"])
    ap.add_argument("--hard_negatives", action="store_true",
                    help="mine BM25 hard negatives (half of each pair's "
                         "negatives come from its pool)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--init_from", default=None,
                    help="bi-encoder checkpoint dir to initialize the BERT "
                         "trunk from (from-scratch cross-attention training "
                         "collapses to uniform logits; a contrastively "
                         "pretrained trunk fixes it)")
    args = ap.parse_args()

    corpus = json.load(open(args.corpus))
    augmenter = None
    if args.pair_style == "semantic":
        from domain_rag_system_tpu.preprocessing.normalizer import _load_tables
        from domain_rag_system_tpu.preprocessing.term_mining import (
            SynonymAugmenter, mine_term_table)

        texts = [f"{d.get('title', '')} "
                 f"{d.get('abstract', d.get('text', ''))}" for d in corpus]
        mined = mine_term_table(texts)
        curated = _load_tables()
        augmenter = SynonymAugmenter([
            mined.get("abbreviations", {}), mined.get("aliases", {}),
            curated.get("abbreviations", {}),
            curated.get("condition_synonyms", {}),
        ])
    pairs = build_pairs(corpus, style=args.pair_style, augmenter=augmenter,
                        aug_seed=args.seed)
    print(f"{len(pairs)} relevance pairs")
    hard_pool = None
    if args.hard_negatives:
        hard_pool = mine_hard_negatives(pairs, k=8)
        print(f"mined hard negatives for {len(hard_pool)} pairs")

    init_trunk = None
    if args.init_from:
        from domain_rag_system_tpu.persistence.checkpoints import (
            extend_position_embeddings, load_encoder_checkpoint)

        config, trunk_params, tokenizer = load_encoder_checkpoint(args.init_from)
        init_trunk, config = extend_position_embeddings(
            trunk_params["bert"], config, args.seq_len)
        args.seq_len = min(args.seq_len, config.max_position_embeddings)
        print(f"initializing trunk from {args.init_from} "
              f"({config.num_layers}L/{config.hidden_size}H, "
              f"{config.max_position_embeddings} positions)")
    else:
        tokenizer = train_wordpiece([t for pair in pairs for t in pair],
                                    vocab_size=args.vocab_size)
        config = BertConfig(
            vocab_size=len(tokenizer), hidden_size=args.hidden,
            num_layers=args.layers, num_heads=args.heads,
            intermediate_size=args.hidden * 4, dropout_rate=0.1,
            max_position_embeddings=args.seq_len, dtype="bfloat16",
        )
    trainer = CrossEncoderTrainer(config, learning_rate=args.lr,
                                  warmup_steps=max(args.steps // 10, 5),
                                  total_steps=args.steps,
                                  group_size=1 + args.negatives)
    trainer.init_state(seq_len=args.seq_len)
    if init_trunk is not None:
        import jax.numpy as jnp

        params = dict(trainer.state.params)
        params["bert"] = jax.tree_util.tree_map(jnp.asarray, init_trunk)
        trainer.state.params = params
    batches = make_relevance_batches(
        tokenizer, pairs, args.batch_size, seq_len=args.seq_len,
        negatives_per_positive=args.negatives, epochs=1000,
        seed=args.seed, hard_negatives=hard_pool)
    history = trainer.train(itertools.islice(batches, args.steps))
    print(f"final: loss={history[-1]['loss']:.4f} acc={history[-1]['accuracy']:.3f}")
    save_encoder_checkpoint(args.out, config, trainer.state.params, tokenizer)
    print(f"checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
