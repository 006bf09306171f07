"""Synonym/abbreviation mining + query augmentation (term_mining.py)."""

import numpy as np

from domain_rag_system_tpu.preprocessing.term_mining import (
    SynonymAugmenter,
    mine_abbreviations,
    mine_aliases,
    mine_term_table,
)


def test_schwartz_hearst_basic():
    texts = [
        "Patients with myocardial infarction (MI) were enrolled.",
        "We studied angiotensin-converting enzyme (ACE) inhibitors.",
        "The 6 min walk test (6MWT) measures capacity.",
    ]
    ab = mine_abbreviations(texts)
    assert ab["MI"] == "myocardial infarction"
    assert ab["ACE"] == "angiotensin-converting enzyme"
    assert "6MWT" in ab


def test_mining_rejects_non_abbreviations():
    texts = [
        "The study (see appendix) was large.",          # lowercase words
        "Total was high (12345).",                       # digits only
        "A long parenthetical remark (this is not an abbreviation here).",
    ]
    ab = mine_abbreviations(texts)
    assert ab == {}


def test_most_frequent_long_form_wins():
    texts = (["heart rate (HR) increased."] * 3
             + ["hazard ratio (HR) was 2.1."] * 5)
    ab = mine_abbreviations(texts)
    assert ab["HR"] == "hazard ratio"


def test_alias_mining():
    texts = [
        "Septo-optic dysplasia, also known as de Morsier syndrome, is rare.",
    ]
    al = mine_aliases(texts)
    assert any("septo-optic dysplasia" in k for k in al)


def test_augmenter_substitutes_and_is_bidirectional():
    table = mine_term_table(
        ["Patients with myocardial infarction (MI) were enrolled."])
    aug = SynonymAugmenter([table["abbreviations"],
                            {"hypertension": ["high blood pressure"]}])
    rng = np.random.default_rng(0)
    # expansion -> abbreviation
    out = aug.augment("risk after myocardial infarction", rng, p=1.0)
    assert out == "risk after MI"
    # abbreviation -> expansion
    out = aug.augment("risk after MI", rng, p=1.0)
    assert out == "risk after myocardial infarction"
    # curated-table entries participate
    out = aug.augment("hypertension management", rng, p=1.0)
    assert out == "high blood pressure management"


def test_augmenter_returns_none_without_match():
    aug = SynonymAugmenter([{"hypertension": ["high blood pressure"]}])
    rng = np.random.default_rng(0)
    assert aug.augment("completely unrelated text", rng, p=1.0) is None
    empty = SynonymAugmenter([])
    assert empty.augment("anything", rng) is None
