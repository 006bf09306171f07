#!/usr/bin/env python
"""Train the domain dual-encoder from scratch (contrastive, on-device).

No pretrained weights exist in this environment, so the dense encoder is
trained on corpus-internal alignment pairs — title ↔ abstract of the same
document plus abstract-sentence ↔ title pairs — with in-batch-negative
InfoNCE (training/contrastive.py). No evaluation queries are used
(leakage-free).

Usage:
    python scripts/train_encoder.py --corpus data/recovered/BioASQ/corpus_subset.json \
        --out checkpoints/medrag-mini --steps 300
"""

import argparse
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
from domain_rag_system_tpu.preprocessing import split_sentences  # noqa: E402
from domain_rag_system_tpu.tokenization import train_wordpiece  # noqa: E402
from domain_rag_system_tpu.training import ContrastiveTrainer  # noqa: E402
from domain_rag_system_tpu.training.contrastive import make_pair_batches  # noqa: E402


def build_pairs(corpus, style="title", augmenter=None, aug_seed=0):
    """Leakage-free alignment pairs.

    style="title":   title <-> abstract, title <-> sentence, and
                     adjacent-sentence pairs (document-style queries).
    style="keyword": sampled informative-term keyword queries <-> passage —
                     closer to the lexical shape of real search queries
                     (short, content words only, no document phrasing).
    style="semantic": question+keyword pairs whose query surface forms are
                     REWRITTEN with mined synonym/abbreviation variants
                     (preprocessing/term_mining.py) — the query then says
                     "MI" while the passage says "myocardial infarction",
                     forcing alignment BM25 cannot provide. Every lexical
                     objective saturated in round 1; this is the semantic
                     signal (VERDICT.md next-round item 1).
    """
    import hashlib
    import re as _re

    stop = set("the a an and or of in on for with to from by is are was were "
               "be been this that these those it its as at we our their than "
               "which who whom has have had can could may might not no".split())

    def keyword_query(text, salt):
        words = [w for w in _re.findall(r"[A-Za-z][A-Za-z0-9-]+", text)
                 if w.lower() not in stop and len(w) > 3]
        if len(words) < 4:
            return None
        # deterministic pseudo-random pick seeded by content
        seed = int(hashlib.md5(f"{salt}|{text[:64]}".encode()).hexdigest()[:8], 16)
        rng = __import__("random").Random(seed)
        k = min(rng.randint(3, 6), len(words))
        return " ".join(rng.sample(words, k))

    if style == "semantic":
        import numpy as _np

        rng = _np.random.default_rng(aug_seed)
        base = build_pairs(corpus, style="question")
        base += build_pairs(corpus, style="keyword")
        pairs = []
        n_aug = 0
        for q, p in base:
            pairs.append((q, p))
            if augmenter is not None:
                variant = augmenter.augment(q, rng, p=0.7)
                if variant:
                    pairs.append((variant, p))
                    n_aug += 1
        print(f"semantic augmentation: {n_aug} variant queries "
              f"({len(augmenter) if augmenter else 0} term entries)")
        return pairs

    pairs = []
    for doc in corpus:
        title = (doc.get("title") or "").strip()
        abstract = (doc.get("abstract") or doc.get("text") or "").strip()
        if not abstract:
            continue
        sentences = [s for s in split_sentences(abstract) if len(s) > 40]
        if style == "question":
            # question-shaped pseudo-queries: keyword kernel wrapped in
            # natural question templates so the encoder sees query phrasing
            templates = [
                "what is known about {}?",
                "what is the role of {}?",
                "which factors are associated with {}?",
                "how does {} work?",
                "is {} effective?",
                "what are the effects of {}?",
            ]
            for i, passage in enumerate([abstract] + sentences):
                for rep in range(3):
                    kw = keyword_query(passage, f"q{i}.{rep}")
                    if not kw:
                        continue
                    import hashlib as _h
                    t_idx = int(_h.md5(f"t{i}.{rep}|{passage[:32]}".encode())
                                .hexdigest()[:4], 16) % len(templates)
                    pairs.append((templates[t_idx].format(kw), passage))
        elif style == "keyword":
            for i, passage in enumerate([abstract] + sentences):
                # several sampled keyword queries per passage (augmentation)
                for rep in range(3):
                    q = keyword_query(passage, f"{i}.{rep}")
                    if q:
                        pairs.append((q, passage))
            if title:
                q = keyword_query(title + " " + abstract, "t")
                if q:
                    pairs.append((q, title))
        else:
            if title:
                pairs.append((title, abstract))
                pairs.extend((title, s) for s in sentences)
            pairs.extend(zip(sentences, sentences[1:]))
    return pairs


def mine_hard_negatives_dense(pairs, miner_checkpoint, k=8):
    """ANCE-style self-mined negatives: the CURRENT best dense encoder
    retrieves each query's top passages; non-positives become negatives.
    BM25-mined negatives teach lexical separation the fusion stack already
    has — dense-mined ones are the errors the dense arm itself makes,
    the curriculum that can move dense-only recall (VERDICT r3 item 4)."""
    import numpy as np

    from domain_rag_system_tpu.models.bert_embedder import BertEmbedder

    emb = BertEmbedder(checkpoint_path=miner_checkpoint, batch_size=128,
                       max_length=128)
    passages = sorted({p for _, p in pairs})
    pass_id = {p: i for i, p in enumerate(passages)}
    P = emb.encode(passages)  # [M, d], L2-normalized
    out = []
    B = 512
    for start in range(0, len(pairs), B):
        batch = pairs[start:start + B]
        Q = emb.encode([q for q, _ in batch])
        scores = Q @ P.T
        part = np.argpartition(-scores, kth=min(k + 1, scores.shape[1] - 1),
                               axis=1)[:, : k + 1]
        for row, (q, pos) in enumerate(batch):
            cand = part[row][np.argsort(-scores[row, part[row]])]
            pos_idx = pass_id[pos]
            out.append([passages[j] for j in cand if j != pos_idx][:k])
    return out


def mine_hard_negatives(pairs, k=8):
    """Per pair: BM25 top-k passages (excluding the positive) as hard
    negatives — batched device scoring over the unique-passage corpus."""
    import numpy as np

    from domain_rag_system_tpu.indexing import BM25Index
    from domain_rag_system_tpu.preprocessing import Chunk
    from domain_rag_system_tpu.ops.sparse_bm25 import bm25_scores
    from domain_rag_system_tpu.utils import topk_desc
    import jax.numpy as jnp

    passages = sorted({p for _, p in pairs})
    pass_id = {p: i for i, p in enumerate(passages)}
    chunks = [Chunk(f"p{i}", f"p{i}", "pubmed", "abstract", p, {})
              for i, p in enumerate(passages)]
    index = BM25Index()
    index.index_chunks(chunks)

    out = []
    B = 256
    for start in range(0, len(pairs), B):
        batch = pairs[start:start + B]
        enc = [index.encode_query(q) for q, _ in batch]
        q_ids = jnp.asarray(np.stack([e[0] for e in enc]))
        q_w = jnp.asarray(np.stack([e[1] for e in enc]))
        scores = np.asarray(bm25_scores(index.doc_terms, index.doc_contrib,
                                        q_ids, q_w,
                                        vocab_size=len(index.vocab)))
        top = topk_desc(scores, k + 1)
        for row, (q, pos) in enumerate(batch):
            pos_idx = pass_id[pos]
            hards = [passages[j] for j in top[row] if j != pos_idx][:k]
            out.append(hards)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default="data/recovered/BioASQ/corpus_subset.json")
    ap.add_argument("--out", default="checkpoints/medrag-mini")
    ap.add_argument("--vocab_size", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--seq_len", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pair_style", default="title",
                    choices=["title", "keyword", "question", "semantic"])
    ap.add_argument("--term_table", default=None,
                    help="mined term table JSON (preprocessing/term_mining); "
                         "default: mine from the training corpus")
    ap.add_argument("--hard_negatives", type=int, default=0,
                    help="BM25-mined hard negatives per query (0 = off)")
    ap.add_argument("--hard_miner", default=None,
                    help="encoder checkpoint for ANCE-style DENSE negative "
                         "mining (replaces the BM25 miner): negatives are "
                         "the miner's own top false retrievals")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize transformer layers during training "
                         "(jax.checkpoint) — trades ~2x layer FLOPs for "
                         "activation memory so deep trunks (12L/768) keep "
                         "the large contrastive batch in-batch negatives "
                         "need (batch 96 at 12L was the OOM ceiling "
                         "without it)")
    ap.add_argument("--init_checkpoint", default=None,
                    help="warm-start from an MLM/ICT pretrain checkpoint "
                         "(scripts/pretrain_encoder.py); reuses its "
                         "tokenizer and geometry, ignores --vocab_size/"
                         "--hidden/--layers/--heads")
    args = ap.parse_args()

    corpus = json.load(open(args.corpus))
    augmenter = None
    if args.pair_style == "semantic":
        from domain_rag_system_tpu.preprocessing.normalizer import _load_tables
        from domain_rag_system_tpu.preprocessing.term_mining import (
            SynonymAugmenter,
            load_term_table,
            mine_term_table,
        )

        if args.term_table:
            mined = load_term_table(args.term_table)
        else:
            texts = [f"{d.get('title', '')} "
                     f"{d.get('abstract', d.get('text', ''))}" for d in corpus]
            mined = mine_term_table(texts)
        curated = _load_tables()
        augmenter = SynonymAugmenter([
            mined.get("abbreviations", {}),
            mined.get("aliases", {}),
            curated.get("abbreviations", {}),
            curated.get("condition_synonyms", {}),
        ])
    pairs = build_pairs(corpus, style=args.pair_style, augmenter=augmenter,
                        aug_seed=args.seed)
    print(f"{len(pairs)} training pairs from {len(corpus)} docs")

    init_params = None
    if args.init_checkpoint:
        from domain_rag_system_tpu.persistence.checkpoints import (
            load_encoder_checkpoint,
        )

        config, init_params, tokenizer = load_encoder_checkpoint(
            args.init_checkpoint)
        if args.remat:
            import dataclasses

            config = dataclasses.replace(config, remat=True)
        args.seq_len = min(args.seq_len, config.max_position_embeddings)
        print(f"warm start from {args.init_checkpoint}: "
              f"{config.num_layers}L/{config.hidden_size}H "
              f"vocab={config.vocab_size} seq_len={args.seq_len}")
    else:
        texts = [t for pair in pairs for t in pair]
        print("training WordPiece vocabulary...")
        tokenizer = train_wordpiece(texts, vocab_size=args.vocab_size)
        print(f"vocab: {len(tokenizer)} tokens")

        config = BertConfig(
            vocab_size=len(tokenizer), hidden_size=args.hidden,
            num_layers=args.layers, num_heads=args.heads,
            intermediate_size=args.hidden * 4, dropout_rate=0.1,
            max_position_embeddings=args.seq_len, dtype="bfloat16",
        )
    trainer = ContrastiveTrainer(config, learning_rate=args.lr,
                                 warmup_steps=max(args.steps // 10, 10),
                                 total_steps=args.steps, seed=args.seed)
    trainer.init_state(seq_len=args.seq_len, init_params=init_params)

    hard_pool = None
    if args.hard_negatives > 0:
        if args.hard_miner:
            hard_pool = mine_hard_negatives_dense(
                pairs, args.hard_miner, k=max(args.hard_negatives * 4, 8))
            print(f"dense-mined (ANCE) hard negatives for "
                  f"{len(hard_pool)} pairs via {args.hard_miner}")
        else:
            hard_pool = mine_hard_negatives(
                pairs, k=max(args.hard_negatives * 4, 8))
            print(f"mined hard negatives for {len(hard_pool)} pairs")

    steps_per_epoch = max(len(pairs) // args.batch_size, 1)
    epochs = -(-args.steps // steps_per_epoch)
    batches = make_pair_batches(tokenizer, pairs, args.batch_size,
                                seq_len=args.seq_len, epochs=epochs,
                                seed=args.seed,
                                hard_negatives=hard_pool,
                                hards_per_query=args.hard_negatives)
    import itertools

    history = trainer.train(itertools.islice(batches, args.steps), log_every=20)
    print(f"final: loss={history[-1]['loss']:.4f} acc={history[-1]['accuracy']:.3f}")

    if args.remat:  # remat is a TRAINING memory knob; serve without it
        import dataclasses

        config = dataclasses.replace(config, remat=False)
    save_encoder_checkpoint(args.out, config, trainer.state.params, tokenizer)
    print(f"checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
