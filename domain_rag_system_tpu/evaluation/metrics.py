"""Retrieval and answer metrics.

Retrieval-metric parity with the reference's
``calculate_retrieval_metrics`` (``evaluation/comprehensive_evaluation.py:25-70``):
retrieved ids are de-duplicated order-preserving before scoring (so multiple
chunks of one document count once), precision is over unique retrieved,
recall over the ground-truth set, hit@k is any-hit, MRR is first-hit
reciprocal rank.

Additions the reference lacks (BASELINE.md requires them): ``recall_at_k``,
``ndcg_at_k`` (binary relevance; the reference lists nDCG only as future
work at ``comprehensive_evaluation.py:1615``) and the FAISS baseline's
``hit@{1,3,5,10}`` (``baselines/faiss/FAISS_BioASQ.py:76-79``).

Answer-aware metrics match ``evaluation/evaluator.py``: yes/no EM, factoid
EM + token-F1, list set-P/R/F1, summary ROUGE-L (LCS) + token-F1.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Dict, Iterable, List, Sequence


def _dedup(retrieved: Sequence[str]) -> List[str]:
    return list(dict.fromkeys(retrieved))


def calculate_retrieval_metrics(
    ground_truth: Sequence[str], retrieved: Sequence[str]
) -> Dict[str, float]:
    """Precision / recall / F1 / hit@k / MRR with dedup semantics."""
    gt_set = set(ground_truth)
    unique = _dedup(retrieved)
    k = len(unique)
    if k == 0:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0, "hit@k": 0.0, "mrr": 0.0}

    tp = sum(1 for r in unique if r in gt_set)
    precision = tp / k
    recall = tp / len(gt_set) if gt_set else 0.0
    f1 = (2 * precision * recall / (precision + recall)) if (precision + recall) else 0.0
    hit = 1.0 if tp > 0 else 0.0
    mrr = 0.0
    for i, r in enumerate(unique, start=1):
        if r in gt_set:
            mrr = 1.0 / i
            break
    return {"precision": precision, "recall": recall, "f1": f1, "hit@k": hit, "mrr": mrr}


def recall_at_k(ground_truth: Sequence[str], retrieved: Sequence[str], k: int) -> float:
    gt_set = set(ground_truth)
    if not gt_set:
        return 0.0
    unique = _dedup(retrieved)[:k]
    return sum(1 for r in unique if r in gt_set) / len(gt_set)


def hit_at_k(ground_truth: Sequence[str], retrieved: Sequence[str], k: int) -> float:
    gt_set = set(ground_truth)
    return 1.0 if any(r in gt_set for r in _dedup(retrieved)[:k]) else 0.0


def ndcg_at_k(ground_truth: Sequence[str], retrieved: Sequence[str], k: int) -> float:
    """Binary-relevance nDCG@k over de-duplicated retrieved ids."""
    gt_set = set(ground_truth)
    if not gt_set:
        return 0.0
    unique = _dedup(retrieved)[:k]
    dcg = sum(
        1.0 / math.log2(i + 2) for i, r in enumerate(unique) if r in gt_set
    )
    ideal_hits = min(len(gt_set), k)
    idcg = sum(1.0 / math.log2(i + 2) for i in range(ideal_hits))
    return dcg / idcg if idcg > 0 else 0.0


def mean_metrics(per_query: Iterable[Dict[str, float]]) -> Dict[str, float]:
    """Field-wise mean over per-query metric dicts."""
    per_query = list(per_query)
    if not per_query:
        return {}
    keys = per_query[0].keys()
    return {k: sum(m.get(k, 0.0) for m in per_query) / len(per_query) for k in keys}


# ------------------------------------------------------------------- answers

_TOKEN = re.compile(r"\w+")


def _norm_tokens(text: str) -> List[str]:
    return _TOKEN.findall(text.lower())


def token_f1(prediction: str, reference: str) -> float:
    """Bag-of-words F1 between prediction and reference."""
    pred = Counter(_norm_tokens(prediction))
    ref = Counter(_norm_tokens(reference))
    overlap = sum((pred & ref).values())
    if overlap == 0:
        return 0.0
    precision = overlap / sum(pred.values())
    recall = overlap / sum(ref.values())
    return 2 * precision * recall / (precision + recall)


def lcs_rouge_l(prediction: str, reference: str) -> float:
    """ROUGE-L F1 via longest common subsequence over word tokens."""
    a, b = _norm_tokens(prediction), _norm_tokens(reference)
    if not a or not b:
        return 0.0
    # O(len(a)·len(b)) DP with a rolling row.
    prev = [0] * (len(b) + 1)
    for x in a:
        curr = [0]
        for j, y in enumerate(b, 1):
            curr.append(prev[j - 1] + 1 if x == y else max(prev[j], curr[-1]))
        prev = curr
    lcs = prev[-1]
    precision = lcs / len(a)
    recall = lcs / len(b)
    return 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0


def _norm_answer(text: str) -> str:
    return " ".join(_norm_tokens(text))


def answer_metrics(
    question_type: str,
    prediction: str,
    references: Sequence[str],
) -> Dict[str, float]:
    """Answer-aware metrics per BioASQ question type.

    yesno   — exact match on the normalized yes/no token;
    factoid — EM against any reference + best token-F1;
    list    — set precision/recall/F1 of comma/semicolon-split items;
    summary — best ROUGE-L and token-F1 over references.
    """
    refs = [r for r in references if r] or [""]
    if question_type == "yesno":
        pred = "yes" if "yes" in _norm_tokens(prediction)[:3] else "no"
        gold = "yes" if any("yes" in _norm_tokens(r)[:3] for r in refs) else "no"
        return {"exact_match": 1.0 if pred == gold else 0.0}

    if question_type == "factoid":
        norm_pred = _norm_answer(prediction)
        em = max(1.0 if norm_pred == _norm_answer(r) else 0.0 for r in refs)
        f1 = max(token_f1(prediction, r) for r in refs)
        return {"exact_match": em, "token_f1": f1}

    if question_type == "list":
        def items(text: str) -> set:
            return {_norm_answer(part) for part in re.split(r"[,;\n]", text)
                    if _norm_answer(part)}

        pred_items = items(prediction)
        best = {"precision": 0.0, "recall": 0.0, "f1": 0.0}
        for r in refs:
            gold_items = items(r)
            if not pred_items or not gold_items:
                continue
            tp = len(pred_items & gold_items)
            p = tp / len(pred_items)
            rc = tp / len(gold_items)
            f1 = 2 * p * rc / (p + rc) if (p + rc) else 0.0
            if f1 >= best["f1"]:
                best = {"precision": p, "recall": rc, "f1": f1}
        return best

    # summary / default
    return {
        "rouge_l": max(lcs_rouge_l(prediction, r) for r in refs),
        "token_f1": max(token_f1(prediction, r) for r in refs),
    }
