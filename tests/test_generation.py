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
