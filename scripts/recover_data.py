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
from domain_rag_system_tpu.etl.kaggle import merge_records  # noqa: E402
from domain_rag_system_tpu.etl.recover import (  # noqa: E402
    recover_kaggle_chunk_map,
    recover_kaggle_queries,
    recover_kaggle_records,
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
    # Kaggle: real records mined out of the reference's result artifacts
    # (metadata + inverted ETL chunk ids — etl/recover.py), merged with the
    # synthetic fill set (collision-dropped), plus the reference's own 8
    # test queries with their gt chunk ids mapped back to recovered docs.
    import json

    chunk_map = recover_kaggle_chunk_map(ref)
    recovered = recover_kaggle_records(
        ref, out / "kaggle" / "recovered_records.json", chunk_map=chunk_map)
    ref_queries = recover_kaggle_queries(
        ref, out / "kaggle" / "reference_queries.json", chunk_map=chunk_map)
    kaggle = merge_records(recovered, synthesize_kaggle_corpus())
    kpath = out / "kaggle" / "extracted_docs.json"
    kpath.parent.mkdir(parents=True, exist_ok=True)
    with open(kpath, "w", encoding="utf-8") as f:
        json.dump(kaggle, f, ensure_ascii=False, indent=1)

    print(f"BioASQ : {len(corpus)} docs, {len(queries)} queries")
    print(f"OpenFDA: {len(fda_corpus)} docs, {len(fda_queries)} queries")
    print(f"Kaggle : {len(kaggle)} docs ({len(recovered)} recovered + "
          f"{len(kaggle) - len(recovered)} synthetic fill), "
          f"{len(ref_queries)} reference queries recovered")


if __name__ == "__main__":
    main()
