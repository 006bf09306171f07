#!/usr/bin/env python
"""Abbreviation-robustness eval: does corpus term mining earn its place?

Round-2 VERDICT flagged corpus-mined terminology as dead weight: it runs
in every serving build (+409 abbreviation entries) but no committed eval
showed it helping (BioASQ-200 moved −0.003 r@5). This eval constructs the
query distribution mining exists FOR: users who query with the domain's
abbreviations rather than spelled-out terms.

Protocol:
  1. Mine abbreviations from the recovered BioASQ corpus
     (Schwartz–Hearst, same pass serving runs) and keep entries the
     curated table does NOT already know.
  2. Rewrite every eval query whose text contains a mined long form
     (≥8 chars) to use the short form instead — e.g. "duchenne muscular
     dystrophy" → "DMD" — keeping ground truth untouched.
  3. Evaluate the rewritten subset with the tuned config, mine_terms ON
     vs OFF, plus the original (unabbreviated) subset as the ceiling.

The reference hardcodes ~35 abbreviations
(`src/preprocessing/medical_term_normalizer.py:8-296`); mining is this
framework's replacement, so it must demonstrably recover the expansion.

Writes results/abbrev_robustness_eval.json.
"""

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def build_abbreviated_queries(corpus_path, queries, min_long_form_chars=8):
    """Rewrite queries spelled-out→abbreviated using MINED-ONLY entries."""
    from domain_rag_system_tpu.preprocessing.normalizer import _load_tables
    from domain_rag_system_tpu.preprocessing.term_mining import (
        mine_abbreviations,
    )

    corpus = json.loads(Path(corpus_path).read_text())
    texts = [(d.get("title") or "") + " " + (d.get("abstract") or "")
             for d in corpus]
    mined = mine_abbreviations(texts)
    base = {k.lower() for k in _load_tables()["abbreviations"]}
    novel = {k: v for k, v in mined.items() if k.lower() not in base}
    # longest expansion first so "type 2 diabetes mellitus" wins over
    # "diabetes mellitus" when both are mined
    rev = sorted(((v, k) for k, v in novel.items()
                  if len(v) >= min_long_form_chars),
                 key=lambda t: -len(t[0]))

    rewritten, originals = [], []
    for q in queries:
        body = q["body"]
        new_body, subs = body, []
        for long_form, short_form in rev:
            pat = re.compile(r"\b" + re.escape(long_form) + r"\b",
                             re.IGNORECASE)
            if pat.search(new_body):
                new_body = pat.sub(short_form, new_body)
                subs.append({"long": long_form, "short": short_form})
        if subs:
            rewritten.append({**q, "body": new_body, "substitutions": subs})
            originals.append(q)
    return rewritten, originals, len(novel)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", default="results/abbrev_robustness_eval.json")
    args = ap.parse_args()

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.evaluation.runners import (
        load_queries,
        run_retrieval_evaluation,
    )
    from domain_rag_system_tpu.serving import build_pipeline

    root = Path(__file__).resolve().parent.parent
    corpus_path = root / "data/recovered/BioASQ/corpus_subset.json"
    queries = load_queries(root / "data/recovered/BioASQ/bioasq_queries.json")
    rewritten, originals, n_novel = build_abbreviated_queries(
        corpus_path, queries)
    print(f"{len(rewritten)}/{len(queries)} queries rewritten with "
          f"{n_novel} mined-only abbreviations", flush=True)

    out = {
        "description": "Abbreviated-query robustness: eval queries "
                       "rewritten with corpus-mined short forms "
                       "(mined-only entries, long form >= 8 chars), "
                       "tuned config, mine_terms on vs off",
        "n_queries": len(rewritten),
        "n_mined_only_entries": n_novel,
        "example_substitutions": [
            {"original": o["body"], "abbreviated": r["body"]}
            for o, r in zip(originals[:5], rewritten[:5])],
    }

    def overall(block):
        o = block["overall"]
        return {k: round(o[k], 4) for k in
                ("recall@5", "ndcg@10", "mrr", "recall", "hit@1")
                if k in o}

    for label, mine, qset in (
            ("abbreviated_mined_on", True, rewritten),
            ("abbreviated_mined_off", False, rewritten),
            ("original_mined_off", False, originals)):
        cfg = RetrievalConfig.tuned()
        cfg.mine_terms = mine
        pipeline, _ = build_pipeline(
            cfg, corpus_kwargs={"pubmed_path": str(corpus_path)})
        res = run_retrieval_evaluation(
            pipeline, qset, batch_size=cfg.batch_size,
            dataset=f"bioasq_abbrev_{label}", stream=True,
            **cfg.query_kwargs())
        out[label] = overall(res)
        print(label, json.dumps(out[label]), flush=True)

    on, off = out["abbreviated_mined_on"], out["abbreviated_mined_off"]
    out["mining_delta"] = {k: round(on[k] - off[k], 4) for k in on}
    print(json.dumps(out["mining_delta"]))
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
