#!/usr/bin/env python
"""Pre-seed the serving embedding cache from per-encoder sweep caches.

``build_pipeline``'s corpus-embedding cache (``emb_<md5>.npz``) is keyed
by encoder stack + dtype + corpus content, so ADOPTING a new stack in a
profile invalidates it — and the first bench/serve run then re-encodes
the 91,853-chunk corpus through every stacked encoder (~10 min per
encoder on the single chip). The sweep tooling already holds each
encoder's unweighted normalized matrix (``stackemb_<name>_<key>.npz``
from scripts/stack_sweep.py); the stacked rows are just
``concat_i(w_i · e_i)`` (models/stacked_embedder.py), so this script
assembles the serving cache entry on the host in seconds.

Usage:
    python scripts/seed_serving_cache.py --profile quality_max_at_scale \
        [--n_chunks 91853] [--cache_dir data/embcache]

Exits nonzero if any per-encoder part is missing (run stack_sweep.py
with that encoder first — it writes the part as a side effect).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np  # noqa: E402

from domain_rag_system_tpu.config import RetrievalConfig  # noqa: E402
from domain_rag_system_tpu.etl.synthetic import synthetic_chunks  # noqa: E402
from domain_rag_system_tpu.preprocessing import (  # noqa: E402
    DataLoader,
    DocumentChunker,
)
from domain_rag_system_tpu.serving import _embedding_cache_key  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--profile", default="quality_max_at_scale")
    ap.add_argument("--n_chunks", type=int, default=91_853)
    ap.add_argument("--cache_dir", default=str(ROOT / "data" / "embcache"))
    args = ap.parse_args()

    cfg = getattr(RetrievalConfig, args.profile)()
    stack = getattr(cfg, "encoder_stack", None)
    if not stack:
        print(f"profile {args.profile} has no encoder stack — nothing to seed")
        return 1

    docs = DataLoader(
        pubmed_path=str(ROOT / "data/recovered/BioASQ/corpus_subset.json")
    ).load_pubmed()
    chunks = DocumentChunker().chunk_documents(docs)
    chunks = chunks + list(synthetic_chunks(max(args.n_chunks - len(chunks), 0)))

    # Same corpus key scheme as stack_sweep.cached_embeddings
    from stack_sweep import corpus_key  # noqa: E402 (scripts/ sibling)

    ckey = corpus_key(chunks)
    cache_dir = Path(args.cache_dir)
    parts = []
    for ckpt, weight in stack:
        part_path = cache_dir / f"stackemb_{Path(ckpt).name}_{ckey}.npz"
        if not part_path.exists():
            print(f"missing per-encoder part {part_path} — run "
                  f"scripts/stack_sweep.py with this encoder first")
            return 1
        e = np.load(part_path)["e"]
        if e.shape[0] != len(chunks):
            print(f"{part_path}: {e.shape[0]} rows != {len(chunks)} chunks")
            return 1
        parts.append(np.float32(weight) * e)

    emb = np.concatenate(parts, axis=1)
    skey = _embedding_cache_key(chunks, cfg)
    out = cache_dir / f"emb_{skey}.npz"
    np.savez_compressed(out, embeddings=emb)
    print(f"seeded {out}  shape={emb.shape}  from {len(parts)} parts")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, str(ROOT / "scripts"))
    raise SystemExit(main())
