#!/usr/bin/env python
"""Preprocess the three corpora into documents/chunks/drug-mapping artifacts.

Flag and artifact parity with the reference ``scripts/preprocess_data.py``
(``:21-129``): writes documents.jsonl, chunks.jsonl, drug_mapping.json and
preprocessing_stats.json into --output_dir.
"""

import argparse
import json
import sys
import time
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.preprocessing import (  # noqa: E402
    DataLoader,
    DocumentChunker,
    MedicalTermNormalizer,
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pubmed_path", default="data/recovered/BioASQ/corpus_subset.json")
    ap.add_argument("--openfda_path", default="data/recovered/OpenFDA/openfda_corpus.json")
    ap.add_argument("--kaggle_path", default="data/recovered/kaggle/extracted_docs.json")
    ap.add_argument("--output_dir", default="data/processed")
    ap.add_argument("--max_chunk_size", type=int, default=512)
    ap.add_argument("--overlap", type=int, default=50)
    args = ap.parse_args()

    t0 = time.time()
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    loader = DataLoader(
        pubmed_path=args.pubmed_path,
        openfda_path=args.openfda_path,
        kaggle_path=args.kaggle_path,
    )
    documents = loader.load_all(missing_ok=True)

    normalizer = MedicalTermNormalizer()
    normalizer.build_drug_mapping_from_data(documents)
    normalizer.save_drug_mapping(str(out / "drug_mapping.json"))

    chunker = DocumentChunker(max_chunk_size=args.max_chunk_size, overlap=args.overlap)
    chunks = chunker.chunk_documents(documents)

    with open(out / "documents.jsonl", "w", encoding="utf-8") as f:
        for doc in documents:
            f.write(json.dumps(doc.to_dict(), ensure_ascii=False) + "\n")
    with open(out / "chunks.jsonl", "w", encoding="utf-8") as f:
        for chunk in chunks:
            f.write(json.dumps(chunk.to_dict(), ensure_ascii=False) + "\n")

    stats = {
        "total_documents": len(documents),
        "documents_by_source": dict(Counter(d.source for d in documents)),
        "total_chunks": len(chunks),
        "chunks_by_source": dict(Counter(c.source for c in chunks)),
        "chunks_by_type": dict(Counter(c.chunk_type for c in chunks)),
        "drug_mappings": len(normalizer.drug_mapping),
        "max_chunk_size": args.max_chunk_size,
        "overlap": args.overlap,
        "elapsed_s": round(time.time() - t0, 2),
    }
    with open(out / "preprocessing_stats.json", "w", encoding="utf-8") as f:
        json.dump(stats, f, indent=2)

    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
