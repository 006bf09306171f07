#!/usr/bin/env python
"""Build the hybrid (dense + BM25) index from chunks.jsonl.

Flag parity with the reference ``scripts/build_index.py`` (``:105-147``):
--embedding_model/--batch_size/--collection_name/--distance_metric/
--bm25_k1/--bm25_b, plus the drug-mapping injection into the BM25
normalizer (reference ``:52-56``). Output is a no-pickle index bundle
(persistence/bundle.py) instead of Qdrant-dir + bm25 pickle.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex  # noqa: E402
from domain_rag_system_tpu.models import MedicalEmbedder  # noqa: E402
from domain_rag_system_tpu.persistence import save_index  # noqa: E402
from domain_rag_system_tpu.preprocessing.documents import Chunk  # noqa: E402
from domain_rag_system_tpu.tokenization import RegexTokenizer  # noqa: E402


def load_chunks(path: str):
    chunks = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            chunks.append(Chunk.from_dict(json.loads(line)))
    return chunks


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chunks_path", default="data/processed/chunks.jsonl")
    ap.add_argument("--drug_mapping_path", default="data/processed/drug_mapping.json")
    ap.add_argument("--indices_dir", default="data/indices")
    ap.add_argument("--embedding_model", default="lexical-hash",
                    help="lexical-hash | HF model name (needs local checkpoint)")
    ap.add_argument("--embedding_dim", type=int, default=2048,
                    help="dimension for the lexical-hash embedder")
    ap.add_argument("--stack", default=None,
                    help="stacked multi-encoder dense arm: comma list of "
                         "checkpoint[:weight] entries (one [N, Σd] index "
                         "scoring a weighted ensemble of encoder cosines — "
                         "the quality_at_scale profile's arm); overrides "
                         "--checkpoint")
    ap.add_argument("--checkpoint", default=None,
                    help="trained encoder checkpoint dir (overrides "
                         "--embedding_model)")
    ap.add_argument("--dense_dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--collection_name", default="medical_rag")
    ap.add_argument("--distance_metric", default="cosine",
                    choices=["cosine", "dot", "euclid"])
    ap.add_argument("--bm25_k1", type=float, default=1.5)
    ap.add_argument("--bm25_b", type=float, default=0.75)
    args = ap.parse_args()

    t0 = time.time()
    chunks = load_chunks(args.chunks_path)
    print(f"Loaded {len(chunks)} chunks from {args.chunks_path}")

    if args.stack:
        stack = []
        for entry in args.stack.split(","):
            ckpt, _, w = entry.partition(":")
            stack.append((ckpt, float(w) if w else 1.0))
        embedder = MedicalEmbedder(backend="stacked", stack=stack,
                                   batch_size=args.batch_size)
        if embedder.backend_name != "StackedBertEmbedder":
            raise SystemExit(f"stacked encoder failed to load: {args.stack}")
    elif args.checkpoint:
        embedder = MedicalEmbedder(model_name=args.embedding_model,
                                   backend="bert",
                                   checkpoint_path=args.checkpoint,
                                   batch_size=args.batch_size)
    else:
        embedder = MedicalEmbedder(
            model_name=args.embedding_model,
            dim=args.embedding_dim,
            batch_size=args.batch_size,
        )

    # Drug-mapping-aware tokenizer parity: the reference injects the mapping
    # into the BM25 normalizer (build_index.py:52-61); here the mapping only
    # affects the preserved-abbreviation list, which is mapping-independent,
    # but we keep the wiring so custom tokenizers can use it.
    tokenizer = RegexTokenizer()

    hybrid = HybridIndex(
        dense_index=DenseIndex(
            embedder,
            collection_name=args.collection_name,
            distance=args.distance_metric,
            dtype=args.dense_dtype,
        ),
        bm25_index=BM25Index(k1=args.bm25_k1, b=args.bm25_b, tokenizer=tokenizer),
    )
    hybrid.index_chunks(chunks)

    save_index(hybrid, args.indices_dir, extra_manifest={
        "embedding_model": args.embedding_model,
        "drug_mapping_path": args.drug_mapping_path,
        "build_elapsed_s": round(time.time() - t0, 2),
    })
    print(json.dumps(hybrid.get_stats(), indent=2, default=str))
    print(f"Index built in {time.time() - t0:.1f}s -> {args.indices_dir}")


if __name__ == "__main__":
    main()
