"""Standalone answer-aware evaluator.

Parity with the reference's ``evaluation/evaluator.py`` (208 LoC): operates
on *saved retrieval output* (not live pipelines) and scores answers per
BioASQ question type — yes/no EM (``evaluator.py:87-100``), factoid
EM+token-F1 (``:102-110``), list set-P/R/F1 (``:112-130``), summary ROUGE-L
(``:48-61``) + token-F1 — plus support coverage over gold snippets
(``:78-84``). Unlike the reference, paths are arguments, not hardcoded
(``:24-27``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

from domain_rag_system_tpu.evaluation.metrics import answer_metrics, mean_metrics
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


def support_coverage(retrieved_texts: Sequence[str],
                     gold_snippets: Sequence[str]) -> float:
    """Fraction of gold snippets whose text appears (loosely) in some
    retrieved chunk — evidence-support metric (reference ``:78-84``)."""
    if not gold_snippets:
        return 0.0
    blob = " ".join(t.lower() for t in retrieved_texts)
    hits = 0
    for snippet in gold_snippets:
        probe = snippet.lower().strip()
        # loose containment: first 80 chars is enough to identify a snippet
        if probe[:80] and probe[:80] in blob:
            hits += 1
    return hits / len(gold_snippets)


def evaluate_answers(
    queries: Sequence[Dict],
    answers: Dict[str, str],
    retrieved_texts: Optional[Dict[str, List[str]]] = None,
) -> Dict:
    """Score generated answers against gold references.

    Args:
      queries: [{id, type, ideal_answer, exact_answer, snippets?}]
      answers: query id → generated answer text
      retrieved_texts: optional query id → retrieved chunk texts, enabling
        support-coverage scoring.
    """
    per_query: List[Dict] = []
    by_type: Dict[str, List[Dict]] = {}
    for q in queries:
        qid = q.get("id", "")
        if qid not in answers:
            continue
        refs = q.get("ideal_answer", [])
        if isinstance(refs, str):
            refs = [refs]
        exact = q.get("exact_answer", [])
        if q.get("type") in ("factoid", "list") and exact:
            flat = []
            for e in (exact if isinstance(exact, list) else [exact]):
                flat.extend(e if isinstance(e, list) else [e])
            refs = [", ".join(flat)] + list(refs)

        metrics = answer_metrics(q.get("type", "summary"), answers[qid], refs)
        record = {"id": qid, "type": q.get("type", ""), "metrics": metrics}
        if retrieved_texts is not None and qid in retrieved_texts:
            record["support_coverage"] = support_coverage(
                retrieved_texts[qid],
                [s.get("text", "") for s in q.get("snippets", [])],
            )
        per_query.append(record)
        by_type.setdefault(record["type"], []).append(metrics)

    overall_by_type = {
        t: mean_metrics(ms) for t, ms in sorted(by_type.items())
    }
    summary = {
        "total_answered": len(per_query),
        "by_type": overall_by_type,
        "per_query": per_query,
    }
    if any("support_coverage" in p for p in per_query):
        covs = [p["support_coverage"] for p in per_query if "support_coverage" in p]
        summary["support_coverage"] = sum(covs) / len(covs)
    return summary


def evaluate_from_files(
    queries_path: str,
    answers_path: str,
    output_path: Optional[str] = None,
) -> Dict:
    """File-based entry point: queries JSON + {id: answer} JSON → report."""
    with open(queries_path, "r", encoding="utf-8") as f:
        queries = json.load(f)
    if isinstance(queries, dict):
        queries = queries.get("questions", [])
    with open(answers_path, "r", encoding="utf-8") as f:
        answers = json.load(f)
    summary = evaluate_answers(queries, answers)
    if output_path:
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(summary, f, indent=2, ensure_ascii=False)
        log.info("wrote %s", output_path)
    return summary
