#!/usr/bin/env python
"""Answer-level evaluation of the structured OPTIONS path (retrieve+generate).

The retrieval evals score doc ids; this scores the GENERATED ANSWER for
option-seeking structured queries: the extractive generator's options list
("Options: A, B, ...") is parsed back into a name set and compared to the
ground-truth qualifying set (the eval query's gt docs mapped to their drug
names) with set precision/recall/F1 — the same list-answer metric family
the answer evaluator uses for BioASQ list questions
(``evaluation/evaluator.py``), applied to the attribute-query types the
reference's suite defines (pregnancy_safe/otc/class/best_rated +
OpenFDA ingredient).

Writes ``results/options_answer_eval.json``.
"""

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from domain_rag_system_tpu.config import RetrievalConfig  # noqa: E402
from domain_rag_system_tpu.evaluation.runners import load_queries  # noqa: E402
from domain_rag_system_tpu.generation.extractive import ExtractiveGenerator  # noqa: E402
from domain_rag_system_tpu.serving import build_pipeline  # noqa: E402

OPTION_TYPES = {
    "kaggle": ("pregnancy_safe_options", "otc_options",
               "class_based_options", "condition_best_rated"),
    "openfda": ("ingredient",),
}


def parse_options(answer: str):
    if not answer.startswith("Options:"):
        return None
    body = answer[len("Options:"):].strip().rstrip(".")
    names = []
    for part in body.split(","):
        part = re.sub(r"\s*\(rated [0-9.]+/10\)", "", part).strip()
        if part:
            names.append(part.lower())
    return names


def set_prf(gold: set, pred: set):
    tp = len(gold & pred)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


def eval_dataset(name: str, cfg, corpus_kwargs, corpus_path, queries_path,
                 names_of):
    pipeline, info = build_pipeline(cfg, corpus_kwargs=corpus_kwargs,
                                    embedding_cache_dir="data/embcache")
    gen = ExtractiveGenerator()
    queries = [q for q in load_queries(queries_path)
               if q["type"] in OPTION_TYPES[name]]
    kw = cfg.query_kwargs()
    kw["top_k"] = 10 if name == "openfda" else 5
    outs = pipeline.query_batch([q["body"] for q in queries], **kw)
    rows, agg = [], {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    n_options = 0
    skipped_unnamed = 0
    scored_queries = []
    for q, out in zip(queries, outs):
        ans = gen.generate(q["body"], out["results"],
                           structured=out.get("structured"))
        pred = parse_options(ans["answer"])
        gold = {n.lower() for d in q["documents"] for n in names_of(d)}
        if not gold:
            # every gt doc is an UNNAMED label (53/80 recovered OpenFDA
            # records carry no brand/generic name) — a name-list answer
            # is unscorable for these by construction, not a miss
            skipped_unnamed += 1
            continue
        scored_queries.append(q)
        is_options = pred is not None
        n_options += is_options
        p, r, f1 = set_prf(gold, set(pred or []))
        for k, v in zip(("precision", "recall", "f1"), (p, r, f1)):
            agg[k] += v
        rows.append({"type": q["type"], "query": q["body"],
                     "answer": ans["answer"][:240],
                     "options_mode": is_options,
                     "n_gold": len(gold), "precision": round(p, 3),
                     "recall": round(r, 3), "f1": round(f1, 3)})
    n = max(len(scored_queries), 1)
    overall = {k: round(v / n, 4) for k, v in agg.items()}
    overall["n_queries"] = len(scored_queries)
    overall["n_skipped_unnamed_gt"] = skipped_unnamed
    overall["options_mode_rate"] = round(n_options / n, 3)
    by_type = {}
    for t in OPTION_TYPES[name]:
        sub = [r_ for r_ in rows if r_["type"] == t]
        if sub:
            by_type[t] = {
                "n": len(sub),
                "f1": round(sum(r_["f1"] for r_ in sub) / len(sub), 4),
                "recall": round(sum(r_["recall"] for r_ in sub) / len(sub), 4),
            }
    return {"overall": overall, "by_type": by_type, "per_query": rows,
            "n_chunks": info["n_chunks"]}


def main() -> None:
    root = Path(__file__).resolve().parent.parent
    results = {}

    # kaggle: doc id -> drug names (primary + generic)
    with open(root / "results/kaggle_corpus_with_distractors.json",
              encoding="utf-8") as f:
        krecs = json.load(f)
    knames = {}
    for r_ in krecs:
        names = [r_["drug_name"]]
        if r_.get("generic_name"):
            names.append(r_["generic_name"])
        knames[r_["doc_id"]] = names
    results["kaggle"] = eval_dataset(
        "kaggle", RetrievalConfig.kaggle_tuned(),
        {"kaggle_path": str(root / "results/kaggle_corpus_with_distractors.json")},
        root / "results/kaggle_corpus_with_distractors.json",
        root / "results/kaggle_generated_queries.json",
        lambda d: knames.get(d, []))

    with open(root / "results/openfda_corpus_with_distractors.json",
              encoding="utf-8") as f:
        frecs = json.load(f)
    fnames = {}
    for r_ in frecs:
        names = [n for n in (r_.get("brand_name"), r_.get("generic_name")) if n]
        fnames[str(r_["id"])] = names
    results["openfda"] = eval_dataset(
        "openfda", RetrievalConfig.openfda_tuned(),
        {"openfda_path": str(root / "results/openfda_corpus_with_distractors.json")},
        root / "results/openfda_corpus_with_distractors.json",
        root / "results/openfda_generated_queries.json",
        lambda d: fnames.get(str(d), []))

    out = {
        "description": "answer-level eval of the structured OPTIONS path: "
                       "generated options lists vs the qualifying-set gt "
                       "names, set P/R/F1 (list-answer metric family)",
        "note": "recall is k-bounded for large qualifying sets (the answer "
                "enumerates the retrieved top-k docs' names)",
        **{k: {kk: vv for kk, vv in v.items() if kk != "per_query"}
           for k, v in results.items()},
        "per_query": {k: v["per_query"] for k, v in results.items()},
    }
    path = root / "results/options_answer_eval.json"
    path.write_text(json.dumps(out, indent=1))
    for name, blk in results.items():
        print(name, blk["overall"], blk["by_type"])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
