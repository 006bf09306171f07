"""Metric correctness, including parity with stored reference per-query
metrics recomputed from their own gt/retrieved id lists."""

import json
import math
from pathlib import Path

import pytest

from domain_rag_system_tpu.evaluation import (
    answer_metrics,
    calculate_retrieval_metrics,
    hit_at_k,
    lcs_rouge_l,
    mean_metrics,
    ndcg_at_k,
    recall_at_k,
    token_f1,
)

REF = Path("/root/reference")


def test_retrieval_metrics_dedup():
    gt = ["a", "b", "c"]
    retrieved = ["a", "a", "x", "b"]  # dup 'a' counts once
    m = calculate_retrieval_metrics(gt, retrieved)
    assert m["precision"] == pytest.approx(2 / 3)   # 2 tp of 3 unique
    assert m["recall"] == pytest.approx(2 / 3)
    assert m["hit@k"] == 1.0
    assert m["mrr"] == 1.0


def test_retrieval_metrics_empty():
    m = calculate_retrieval_metrics(["a"], [])
    assert all(v == 0.0 for v in m.values())


def test_recall_and_hit_at_k():
    gt = ["a", "b", "c", "d"]
    retrieved = ["x", "a", "b", "y", "c"]
    assert recall_at_k(gt, retrieved, 2) == pytest.approx(1 / 4)
    assert recall_at_k(gt, retrieved, 5) == pytest.approx(3 / 4)
    assert hit_at_k(gt, retrieved, 1) == 0.0
    assert hit_at_k(gt, retrieved, 2) == 1.0


def test_ndcg():
    gt = ["a", "b"]
    # perfect ranking
    assert ndcg_at_k(gt, ["a", "b", "x"], 10) == pytest.approx(1.0)
    # hit at rank 2 only
    expected = (1 / math.log2(3)) / (1 + 1 / math.log2(3))
    assert ndcg_at_k(gt, ["x", "a"], 10) == pytest.approx(expected)
    assert ndcg_at_k(gt, [], 10) == 0.0


def test_mean_metrics():
    out = mean_metrics([{"a": 1.0, "b": 0.0}, {"a": 0.0, "b": 1.0}])
    assert out == {"a": 0.5, "b": 0.5}


@pytest.mark.skipif(not REF.exists(), reason="reference mount absent")
def test_parity_with_reference_faiss_metrics():
    """Recompute each stored per-query metric from its own id lists — our
    implementation must reproduce the reference's stored numbers."""
    data = json.load(open(REF / "results" / "bioasq_faiss_test_results.json"))
    checked = 0
    for q in list(data.values())[:50]:
        ours = calculate_retrieval_metrics(q["ground_truth_ids"], q["retrieved_ids"])
        theirs = q["metrics"]
        for key_theirs, key_ours in [("precision", "precision"), ("recall", "recall"),
                                     ("f1", "f1"), ("mrr", "mrr")]:
            if key_theirs in theirs:
                assert ours[key_ours] == pytest.approx(theirs[key_theirs], abs=1e-9), q["query"]
        checked += 1
    assert checked == 50


# ----------------------------------------------------------------- answers

def test_answer_yesno():
    assert answer_metrics("yesno", "Yes, it does.", ["yes"]) == {"exact_match": 1.0}
    assert answer_metrics("yesno", "No evidence supports this.", ["yes"]) == {"exact_match": 0.0}


def test_answer_factoid():
    m = answer_metrics("factoid", "the BRCA1 gene", ["BRCA1 gene"])
    assert m["token_f1"] > 0.7
    m2 = answer_metrics("factoid", "BRCA1 gene", ["brca1 gene"])
    assert m2["exact_match"] == 1.0  # case-insensitive normalized EM
    m3 = answer_metrics("factoid", "the TP53 gene", ["BRCA1 gene"])
    assert m3["exact_match"] == 0.0


def test_answer_list():
    m = answer_metrics("list", "aspirin, ibuprofen, naproxen",
                       ["aspirin; naproxen"])
    assert m["recall"] == pytest.approx(1.0)
    assert m["precision"] == pytest.approx(2 / 3)


def test_answer_summary():
    m = answer_metrics("summary", "exon skipping restores the reading frame",
                       ["antisense exon skipping restores the reading frame"])
    assert m["rouge_l"] > 0.8
    assert m["token_f1"] > 0.8


def test_token_f1_and_rouge_edge_cases():
    assert token_f1("", "anything") == 0.0
    assert lcs_rouge_l("", "x") == 0.0
    assert lcs_rouge_l("a b c", "a b c") == pytest.approx(1.0)
