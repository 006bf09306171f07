"""Extractive generator decoding per question type."""

from domain_rag_system_tpu.generation import ExtractiveGenerator


def _ctx(cid, text):
    return {"chunk_id": cid, "text": text, "source": "pubmed",
            "chunk_type": "abstract"}


CONTEXTS = [
    _ctx("c1", "Metformin is the first line treatment for type 2 diabetes. "
               "It lowers hepatic glucose production."),
    _ctx("c2", "Aspirin is not recommended for primary prevention in "
               "elderly patients without cardiovascular disease."),
    _ctx("c3", "Common adverse events include: nausea, diarrhea, headache."),
]


def test_summary_extracts_relevant_sentences():
    gen = ExtractiveGenerator()
    out = gen.generate("What is the first line treatment for type 2 diabetes?",
                       CONTEXTS, question_type="summary")
    assert "Metformin" in out["answer"]
    assert "c1" in out["sources"]
    assert out["metadata"]["model_type"] == "extractive"


def test_yesno_polarity():
    gen = ExtractiveGenerator(max_sentences=1)
    out = gen.generate(
        "Is aspirin recommended for primary prevention in elderly patients?",
        CONTEXTS, question_type="yesno")
    assert out["answer"] == "no"
    out = gen.generate(
        "Is metformin the first line treatment for diabetes?",
        CONTEXTS, question_type="yesno")
    assert out["answer"] == "yes"


def test_list_surfaces_enumeration():
    gen = ExtractiveGenerator()
    out = gen.generate("What are the common adverse events?",
                       CONTEXTS, question_type="list")
    assert "nausea" in out["answer"]
    assert out["answer"].startswith("nausea") or "include" not in out["answer"]


def test_no_overlap_degrades_gracefully():
    gen = ExtractiveGenerator()
    out = gen.generate("entirely unrelated astrophysics question",
                       CONTEXTS, question_type="summary")
    assert out["sources"] == []


def test_extractive_options_answer_for_structured_queries():
    """Option-seeking structured intent -> the answer enumerates the
    qualifying drugs (with ratings when rating-ranked) instead of
    extracting sentences."""
    from domain_rag_system_tpu.generation.extractive import ExtractiveGenerator

    gen = ExtractiveGenerator()
    contexts = [
        {"chunk_id": "c1", "text": "Benzogel treats Acne.",
         "metadata": {"drug_name": "Benzogel", "rating": 6.5}},
        {"chunk_id": "c2", "text": "Clearasol treats Acne.",
         "metadata": {"drug_name": "Clearasol", "rating": 7.2}},
        {"chunk_id": "c3", "text": "Benzogel directions.",
         "metadata": {"drug_name": "Benzogel", "rating": 6.5}},
    ]
    spec = {"hard": {"rx_otc": {"$contains": "OTC"}}, "soft": None,
            "rank_by_rating": False}
    out = gen.generate("Which OTC options exist for Acne?", contexts,
                       structured=spec)
    assert out["metadata"]["question_type"] == "options"
    assert out["answer"] == "Options: Benzogel, Clearasol."

    rated = gen.generate("best rated for acne", contexts,
                         structured={"hard": {"medical_condition": "Acne"},
                                     "soft": None, "rank_by_rating": True})
    assert "rated 6.5/10" in rated["answer"] and "rated 7.2/10" in rated["answer"]

    # no structured block -> normal extractive path
    plain = gen.generate("Which OTC options exist for Acne?", contexts)
    assert plain["metadata"]["question_type"] != "options"

    # condition-only soft spec must NOT trigger the options mode
    softonly = gen.generate("What drugs treat Acne?", contexts,
                            structured={"hard": None,
                                        "soft": {"medical_condition": "Acne"},
                                        "rank_by_rating": False})
    assert softonly["metadata"].get("question_type") != "options"
