#!/usr/bin/env python
"""Rebuild evaluation corpora from the reference's shipped artifacts.

The reference strips its large corpus blobs (see .MISSING_LARGE_BLOBS) and
this environment has no network, so the corpora are reconstructed from
snippets/result payloads. See domain_rag_system_tpu/etl/recover.py for
provenance details.

Usage:
    python scripts/recover_data.py [--reference /root/reference] [--out data/recovered]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.etl import (  # noqa: E402
    recover_bioasq_corpus,
    recover_bioasq_queries,
    recover_openfda_corpus,
    recover_openfda_queries,
    synthesize_kaggle_corpus,
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="data/recovered")
    args = ap.parse_args()

    ref = Path(args.reference)
    out = Path(args.out)

    corpus = recover_bioasq_corpus(ref, out / "BioASQ" / "corpus_subset.json")
    queries = recover_bioasq_queries(ref, out / "BioASQ" / "bioasq_queries.json")
    fda_corpus = recover_openfda_corpus(ref, out / "OpenFDA" / "openfda_corpus.json")
    fda_queries = recover_openfda_queries(ref, out / "OpenFDA" / "openfda_test_queries.json")
    kaggle = synthesize_kaggle_corpus(output_path=out / "kaggle" / "extracted_docs.json")

    print(f"BioASQ : {len(corpus)} docs, {len(queries)} queries")
    print(f"OpenFDA: {len(fda_corpus)} docs, {len(fda_queries)} queries")
    print(f"Kaggle : {len(kaggle)} synthetic docs")


if __name__ == "__main__":
    main()
