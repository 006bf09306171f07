"""Standalone answer evaluator + profiling utilities."""

import json

from domain_rag_system_tpu.evaluation.evaluator import (
    evaluate_answers,
    evaluate_from_files,
    support_coverage,
)

QUERIES = [
    {"id": "q1", "type": "yesno", "ideal_answer": ["Yes, it is effective."],
     "snippets": [{"text": "the drug was shown to be effective in trials"}]},
    {"id": "q2", "type": "factoid", "ideal_answer": ["the BRCA1 gene"],
     "exact_answer": [["BRCA1"]]},
    {"id": "q3", "type": "list", "ideal_answer": ["aspirin; ibuprofen"],
     "exact_answer": [["aspirin"], ["ibuprofen"]]},
    {"id": "q4", "type": "summary",
     "ideal_answer": ["Exon skipping restores the reading frame."]},
]

ANSWERS = {
    "q1": "Yes, trials support it.",
    "q2": "BRCA1",
    "q3": "aspirin, ibuprofen, naproxen",
    "q4": "Exon skipping therapy restores the reading frame.",
}


def test_evaluate_answers_by_type():
    summary = evaluate_answers(QUERIES, ANSWERS)
    assert summary["total_answered"] == 4
    assert summary["by_type"]["yesno"]["exact_match"] == 1.0
    assert summary["by_type"]["factoid"]["exact_match"] == 1.0
    assert summary["by_type"]["list"]["recall"] == 1.0
    assert summary["by_type"]["summary"]["rouge_l"] > 0.8


def test_support_coverage():
    texts = ["in randomized trials the drug was shown to be effective in "
             "trials of adults"]
    assert support_coverage(texts, ["the drug was shown to be effective in trials"]) == 1.0
    assert support_coverage(texts, ["completely absent snippet text here"]) == 0.0
    assert support_coverage([], []) == 0.0


def test_evaluate_answers_with_support(tmp_path):
    summary = evaluate_answers(
        QUERIES, ANSWERS,
        retrieved_texts={"q1": ["the drug was shown to be effective in trials"]},
    )
    assert summary["support_coverage"] == 1.0


def test_evaluate_from_files(tmp_path):
    qp = tmp_path / "q.json"
    ap = tmp_path / "a.json"
    qp.write_text(json.dumps({"questions": QUERIES}))
    ap.write_text(json.dumps(ANSWERS))
    out = tmp_path / "out.json"
    summary = evaluate_from_files(str(qp), str(ap), str(out))
    assert out.exists()
    assert summary["total_answered"] == 4


def test_profiler_helpers_do_not_crash(tmp_path):
    from domain_rag_system_tpu.utils.profiling import annotate, trace

    import jax.numpy as jnp

    with trace(str(tmp_path / "trace")):
        with annotate("test-span"):
            _ = jnp.ones(8).sum()


def test_checkpoint_round_trip(tmp_path):
    import numpy as np

    from domain_rag_system_tpu.models.bert import BertConfig, SentenceEncoder
    from domain_rag_system_tpu.persistence.checkpoints import (
        load_encoder_checkpoint, save_encoder_checkpoint)
    from domain_rag_system_tpu.tokenization import train_wordpiece

    import jax
    import jax.numpy as jnp

    tok = train_wordpiece(["some medical text about drugs"] * 3, vocab_size=64)
    config = BertConfig.tiny(vocab_size=len(tok))
    module = SentenceEncoder(config)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                         jnp.ones((1, 8), jnp.int32))["params"]
    save_encoder_checkpoint(tmp_path / "ckpt", config, params, tok)
    config2, params2, tok2 = load_encoder_checkpoint(tmp_path / "ckpt")
    assert config2 == config
    assert len(tok2) == len(tok)
    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(params2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
