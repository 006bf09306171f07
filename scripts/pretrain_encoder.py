#!/usr/bin/env python
"""Pretrain the domain encoder on raw corpus text: MLM, then ICT.

The supervision-free recipe (VERDICT round-2 item 1): masked-language-model
pretraining over corpus chunks builds a domain prior (the reference gets
this for free by downloading S-PubMedBert, ``src/indexing/embedder.py:21``);
the Inverse Cloze Task then shapes sentence-level retrieval alignment —
all from corpus documents only, no evaluation queries (leakage-free).

The output checkpoint seeds the contrastive fine-tune:

    python scripts/pretrain_encoder.py --out checkpoints/medrag-ict
    python scripts/train_encoder.py --init_checkpoint checkpoints/medrag-ict \
        --pair_style semantic --hard_negatives 4 --out checkpoints/medrag-pre
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import itertools  # noqa: E402

from domain_rag_system_tpu.models.bert import BertConfig  # noqa: E402
from domain_rag_system_tpu.persistence.checkpoints import (  # noqa: E402
    save_encoder_checkpoint,
)
from domain_rag_system_tpu.tokenization import train_wordpiece  # noqa: E402
from domain_rag_system_tpu.training import (  # noqa: E402
    ContrastiveTrainer,
    MLMTrainer,
    build_ict_pairs,
    make_mlm_batches,
)
from domain_rag_system_tpu.training.contrastive import make_pair_batches  # noqa: E402


def load_corpus_texts(root: Path):
    """Every recovered corpus as raw passages (title + body merged).

    Returns (mlm_texts, ict_passages): MLM sees everything; ICT needs
    multi-sentence passages (abstracts / document bodies)."""
    mlm_texts, ict_passages = [], []

    bioasq = root / "data/recovered/BioASQ/corpus_subset.json"
    if bioasq.exists():
        with open(bioasq, "r", encoding="utf-8") as f:
            for d in json.load(f):
                title = (d.get("title") or "").strip()
                abstract = (d.get("abstract") or "").strip()
                if title and abstract:
                    mlm_texts.append(f"{title}. {abstract}")
                elif title or abstract:
                    mlm_texts.append(title or abstract)
                if abstract:
                    ict_passages.append(abstract)

    openfda = root / "data/recovered/OpenFDA/openfda_corpus.json"
    if openfda.exists():
        with open(openfda, "r", encoding="utf-8") as f:
            for d in json.load(f):
                text = (d.get("text") or "").strip()
                if text:
                    mlm_texts.append(text)
                    ict_passages.append(text)

    kaggle = root / "data/recovered/kaggle/extracted_docs.json"
    if kaggle.exists():
        with open(kaggle, "r", encoding="utf-8") as f:
            for d in json.load(f):
                parts = [str(v) for v in d.values()
                         if isinstance(v, str) and len(v) > 40]
                if parts:
                    text = " ".join(parts)
                    mlm_texts.append(text)
                    ict_passages.append(text)

    return mlm_texts, ict_passages


def window_texts(texts, max_chars=600):
    """Split long passages into ~max_chars windows so one tokenized row
    covers the whole window (instead of truncating tails away)."""
    out = []
    for t in texts:
        t = t.strip()
        if len(t) <= max_chars:
            if t:
                out.append(t)
            continue
        for start in range(0, len(t), max_chars):
            piece = t[start:start + max_chars].strip()
            if len(piece) > 60:
                out.append(piece)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="checkpoints/medrag-ict")
    ap.add_argument("--vocab_size", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--seq_len", type=int, default=128)
    ap.add_argument("--mlm_steps", type=int, default=3000)
    ap.add_argument("--mlm_batch", type=int, default=128)
    ap.add_argument("--mlm_lr", type=float, default=3e-4)
    ap.add_argument("--ict_steps", type=int, default=1500)
    ap.add_argument("--ict_batch", type=int, default=256)
    ap.add_argument("--ict_lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pre_ln", action="store_true",
                    help="pre-LN residual blocks — required past ~8 layers "
                         "(post-LN 10L/12L MLM plateaus at unigram loss)")
    ap.add_argument("--skip_ict", action="store_true",
                    help="save the pure-MLM checkpoint (ablation)")
    args = ap.parse_args()

    root = Path(__file__).resolve().parent.parent
    mlm_texts, ict_passages = load_corpus_texts(root)
    mlm_windows = window_texts(mlm_texts)
    print(f"corpus: {len(mlm_texts)} documents → {len(mlm_windows)} MLM "
          f"windows, {len(ict_passages)} ICT passages")

    print("training WordPiece vocabulary...")
    tokenizer = train_wordpiece(mlm_windows, vocab_size=args.vocab_size)
    print(f"vocab: {len(tokenizer)} tokens")

    config = BertConfig(
        vocab_size=len(tokenizer), hidden_size=args.hidden,
        num_layers=args.layers, num_heads=args.heads,
        intermediate_size=args.hidden * 4, dropout_rate=0.1,
        max_position_embeddings=args.seq_len, dtype="bfloat16",
        pre_ln=args.pre_ln,
    )

    # ---- stage 1: MLM -----------------------------------------------------
    mlm = MLMTrainer(config, learning_rate=args.mlm_lr,
                     warmup_steps=max(args.mlm_steps // 10, 20),
                     total_steps=args.mlm_steps, seed=args.seed)
    batches = make_mlm_batches(tokenizer, mlm_windows, args.mlm_batch,
                               seq_len=args.seq_len, seed=args.seed)
    hist = mlm.train(itertools.islice(batches, args.mlm_steps))
    print(f"MLM final: loss={hist[-1]['loss']:.4f} "
          f"masked-acc={hist[-1]['accuracy']:.3f}")
    bert_params = mlm.state.params["bert"]

    if args.skip_ict:
        save_encoder_checkpoint(args.out, config,
                                {"bert": bert_params}, tokenizer)
        print(f"MLM-only checkpoint -> {args.out}")
        return

    # ---- stage 2: ICT -----------------------------------------------------
    pairs = build_ict_pairs(ict_passages, seed=args.seed)
    print(f"{len(pairs)} ICT pairs")
    trainer = ContrastiveTrainer(config, learning_rate=args.ict_lr,
                                 warmup_steps=max(args.ict_steps // 10, 10),
                                 total_steps=args.ict_steps, seed=args.seed)
    trainer.init_state(seq_len=args.seq_len,
                       init_params={"bert": bert_params})
    ict_batches = make_pair_batches(
        tokenizer, pairs, args.ict_batch, seq_len=args.seq_len,
        epochs=max(args.ict_steps * args.ict_batch // max(len(pairs), 1), 1) + 1,
        seed=args.seed)
    hist = trainer.train(itertools.islice(ict_batches, args.ict_steps))
    print(f"ICT final: loss={hist[-1]['loss']:.4f} "
          f"acc={hist[-1]['accuracy']:.3f}")

    save_encoder_checkpoint(args.out, config, trainer.state.params, tokenizer)
    print(f"checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
