#!/usr/bin/env python
"""Regenerate the same-corpus dense-only control artifacts.

For each dataset the control runs ``baselines/jax_flat_baseline.py``'s
flat-cosine retrieval over the SAME corpus (including distractors) and the
SAME query set the system eval uses — the honest bar the comprehensive
report compares against (reference analog: ``baselines/faiss/*``,
``baselines/Qdrant/Qdrant_test.py``).

Usage:
    python scripts/make_controls.py [--datasets kaggle openfda]
"""

import argparse
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def kaggle_control_inputs(results_dir: Path):
    """Corpus docs + queries for the kaggle control. Regenerates the
    distractor corpus/queries if evaluate.py hasn't written them yet."""
    from domain_rag_system_tpu.etl.kaggle import (
        build_etl_chunks,
        build_test_queries,
        make_distractor_records,
    )

    corpus_path = results_dir / "kaggle_corpus_with_distractors.json"
    queries_path = results_dir / "kaggle_generated_queries.json"
    if corpus_path.exists() and queries_path.exists():
        with open(corpus_path, encoding="utf-8") as f:
            records = json.load(f)
        with open(queries_path, encoding="utf-8") as f:
            queries = json.load(f)
    else:
        with open("data/recovered/kaggle/extracted_docs.json",
                  encoding="utf-8") as f:
            real = json.load(f)
        hard = make_distractor_records(real, n=0, hard_per_record=2)
        queries = build_test_queries(real + hard)
        records = real + hard + make_distractor_records(
            real, n=600, shadows_per_record=3)

    # doc-level text = the record's ETL chunks joined (same information
    # the system indexes, flattened to one doc per record)
    chunks = build_etl_chunks(records)
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c["text"])
    corpus = [{"id": doc_id, "title": "", "text": " ".join(texts)}
              for doc_id, texts in by_doc.items()]
    return corpus, queries


def openfda_control_inputs(results_dir: Path):
    from domain_rag_system_tpu.etl.openfda import (
        build_openfda_queries,
        make_openfda_distractors,
    )

    # prefer the distractor-augmented corpus evaluate.py indexed (same
    # corpus + queries as the system eval, like the kaggle control)
    corpus_path = results_dir / "openfda_corpus_with_distractors.json"
    if corpus_path.exists():
        with open(corpus_path, encoding="utf-8") as f:
            corpus = json.load(f)
    else:
        with open("data/recovered/OpenFDA/openfda_corpus.json",
                  encoding="utf-8") as f:
            corpus = json.load(f)
        corpus = corpus + make_openfda_distractors(corpus)
    queries_path = results_dir / "openfda_generated_queries.json"
    if queries_path.exists():
        with open(queries_path, encoding="utf-8") as f:
            queries = json.load(f)
    else:
        queries = build_openfda_queries(corpus)
    return corpus, queries


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datasets", nargs="+", default=["kaggle", "openfda"],
                    choices=["kaggle", "openfda"])
    ap.add_argument("--results_dir", default="results")
    ap.add_argument("--embedding_dim", type=int, default=2048)
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "baselines"))
    from jax_flat_baseline import aggregate, run_baseline  # noqa: E402

    from domain_rag_system_tpu.models import MedicalEmbedder  # noqa: E402

    results_dir = Path(args.results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    top_k = {"kaggle": 5, "openfda": 10}

    for name in args.datasets:
        corpus, queries = (kaggle_control_inputs(results_dir) if name == "kaggle"
                           else openfda_control_inputs(results_dir))
        embedder = MedicalEmbedder(dim=args.embedding_dim)
        results, build_s = run_baseline(corpus, queries, embedder,
                                        top_k=top_k[name])
        overall, per_type = aggregate(results)
        with open(results_dir / f"{name}_control_results.json", "w",
                  encoding="utf-8") as f:
            json.dump(results, f, indent=1)
        header = ["group", "n", "precision", "recall", "f1", "mrr",
                  "hit@1", "hit@3", "hit@5", "hit@10", "recall@5", "ndcg@10"]
        with open(results_dir / f"{name}_control_summary.csv", "w",
                  newline="", encoding="utf-8") as f:
            writer = csv.writer(f)
            writer.writerow(header)
            writer.writerow(["overall", len(results)]
                            + [f"{overall.get(h, 0.0):.4f}" for h in header[2:]])
            for t, m in per_type.items():
                writer.writerow(
                    [t, sum(1 for r in results.values() if r["type"] == t)]
                    + [f"{m.get(h, 0.0):.4f}" for h in header[2:]])
        print(f"{name} control ({len(corpus)} docs, {len(queries)} queries): "
              f"recall@5={overall.get('recall@5', 0):.4f} "
              f"ndcg@10={overall.get('ndcg@10', 0):.4f} "
              f"mrr={overall.get('mrr', 0):.4f} hit@k={overall.get('hit@k', 0):.4f}")


if __name__ == "__main__":
    main()
