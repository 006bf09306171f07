"""Unit tests for the preprocessing layer (loader / chunker / normalizer /
query preprocessor / sentence splitter)."""

import json

import pytest

from domain_rag_system_tpu.preprocessing import (
    Chunk,
    DataLoader,
    Document,
    DocumentChunker,
    MedicalTermNormalizer,
    QueryPreprocessor,
    split_sentences,
)
from domain_rag_system_tpu.preprocessing.data_loader import build_kaggle_content


# --------------------------------------------------------------- sentences

def test_split_sentences_basic():
    text = "Aspirin works. It reduces fever! Does it treat pain? Yes."
    assert split_sentences(text) == [
        "Aspirin works.",
        "It reduces fever!",
        "Does it treat pain?",
        "Yes.",
    ]


def test_split_sentences_protects_abbreviations():
    text = "Drugs, e.g. aspirin, are common. See Fig. 2 for details. Dr. Smith agrees."
    sents = split_sentences(text)
    assert len(sents) == 3
    assert sents[0] == "Drugs, e.g. aspirin, are common."
    assert sents[1] == "See Fig. 2 for details."


def test_split_sentences_decimal_numbers():
    text = "The p value was 0.05 overall. Effect size was 1.2 in the cohort."
    assert len(split_sentences(text)) == 2


def test_split_sentences_empty():
    assert split_sentences("") == []


# --------------------------------------------------------------- documents

def test_document_round_trip():
    d = Document("pubmed_1", "pubmed", "T", "C", {"k": "v"})
    assert Document.from_dict(d.to_dict()) == d
    c = Chunk("pubmed_1_title", "pubmed_1", "pubmed", "title", "T", {"s": 1})
    assert Chunk.from_dict(c.to_dict()) == c


# --------------------------------------------------------------- loader

def test_loader_pubmed(tmp_path):
    corpus = [{"id": "123", "title": "A title", "abstract": "An abstract.",
               "link": "http://x/123"}]
    p = tmp_path / "corpus.json"
    p.write_text(json.dumps(corpus))
    docs = DataLoader(pubmed_path=str(p)).load_pubmed()
    assert len(docs) == 1
    assert docs[0].doc_id == "pubmed_123"
    assert docs[0].metadata["pubmed_id"] == "123"


def test_loader_openfda(tmp_path):
    corpus = [{
        "id": "abc", "brand_name": "Tylenol", "generic_name": "ACETAMINOPHEN",
        "set_id": "s1", "text": "Drug names: Tylenol\nPurpose: pain relief",
        "metadata": {"has_warnings": True},
    }]
    p = tmp_path / "fda.json"
    p.write_text(json.dumps(corpus))
    docs = DataLoader(openfda_path=str(p)).load_openfda()
    assert docs[0].doc_id == "openfda_abc"
    assert docs[0].title == "Tylenol (ACETAMINOPHEN)"
    assert docs[0].metadata["has_warnings"] is True


def test_loader_kaggle_content_sections(tmp_path):
    item = {
        "doc_id": "k1", "drug_name": "Advil", "generic_name": "ibuprofen",
        "medical_condition": "Pain", "drug_classes": ["NSAID"],
        "brand_names": ["Advil", "Motrin"], "rx_otc": "OTC",
        "side_effects_structured": {"serious": ["ulcer"], "common": ["nausea"]},
        "side_effects_raw": "raw side effect text",
        "pregnancy_category": "Risk cannot be ruled out",
        "pregnancy_category_raw": "C", "alcohol": "X", "csa": "N",
        "related_drugs": [{"name": "naproxen"}],
        "condition_summary": "Pain is unpleasant.",
        "rating": 7.0,
    }
    content = build_kaggle_content(item)
    for header in ["=== BASIC INFORMATION ===", "=== BRAND NAMES ===",
                   "=== SIDE EFFECTS ===", "=== SIDE EFFECTS (RAW) ===",
                   "=== SAFETY INFORMATION ===", "=== RELATED DRUGS ===",
                   "=== CONDITION INFORMATION ==="]:
        assert header in content
    assert "1. ulcer" in content
    assert "Avoid alcohol" in content

    p = tmp_path / "kaggle.json"
    p.write_text(json.dumps([item]))
    docs = DataLoader(kaggle_path=str(p)).load_kaggle()
    assert docs[0].doc_id == "kaggle_k1"
    assert docs[0].title == "Advil for Pain"


def test_loader_missing_raises(tmp_path):
    loader = DataLoader(pubmed_path=str(tmp_path / "nope.json"))
    with pytest.raises(FileNotFoundError):
        loader.load("pubmed")
    assert loader.load("pubmed", missing_ok=True) == []


# --------------------------------------------------------------- chunker

def _pubmed_doc(content: str) -> Document:
    return Document("pubmed_1", "pubmed", "Some title", content, {"pubmed_id": "1"})


def test_chunker_pubmed_short_abstract():
    chunks = DocumentChunker().chunk_documents([_pubmed_doc("Short abstract.")])
    assert [c.chunk_id for c in chunks] == ["pubmed_1_title", "pubmed_1_abstract"]
    assert chunks[0].chunk_type == "title"
    assert chunks[1].metadata["section"] == "abstract"


def test_chunker_pubmed_long_abstract_splits_with_overlap():
    sentences = [f"Sentence number {i} about medicine and treatments." for i in range(30)]
    doc = _pubmed_doc(" ".join(sentences))
    chunker = DocumentChunker(max_chunk_size=200, overlap=50)
    chunks = chunker.chunk_documents([doc])
    body = [c for c in chunks if c.chunk_type == "abstract"]
    assert len(body) > 1
    assert all(c.chunk_id == f"pubmed_1_abstract_{i}" for i, c in enumerate(body))
    # one-sentence overlap: last sentence of piece i reappears in piece i+1
    for a, b in zip(body, body[1:]):
        last_sentence = split_sentences(a.text)[-1]
        assert b.text.startswith(last_sentence)


def test_chunker_openfda_sections():
    content = (
        "Drug names: Tylenol (ACETAMINOPHEN)\n"
        "Active ingredients: Acetaminophen 500 mg\n"
        "Indications and usage: temporary relief of minor aches\n"
        "Warning information: liver warning applies\n"
    )
    doc = Document("openfda_1", "openfda", "Tylenol", content, {})
    chunks = DocumentChunker().chunk_documents([doc])
    types = {c.chunk_type for c in chunks}
    assert {"title", "drug_names", "active_ingredients", "indications", "warnings"} <= types
    drug_names = next(c for c in chunks if c.chunk_type == "drug_names")
    assert drug_names.text == "Tylenol (ACETAMINOPHEN)"
    assert drug_names.chunk_id == "openfda_1_drug_names"


def test_chunker_kaggle_sections():
    content = (
        "=== BASIC INFORMATION ===\nDrug Name: Advil\n\n"
        "=== SIDE EFFECTS (RAW) ===\nnausea and dizziness\n\n"
        "=== CONDITION INFORMATION ===\nPain management overview"
    )
    doc = Document("kaggle_1", "kaggle", "Advil for Pain", content, {})
    chunks = DocumentChunker().chunk_documents([doc])
    by_type = {c.chunk_type: c for c in chunks}
    assert "basic_info" in by_type
    assert "side_effects_raw" in by_type
    assert "condition_info" in by_type
    assert by_type["side_effects_raw"].text == "nausea and dizziness"


def test_chunker_generic_fallback_and_stats():
    doc = Document("x_1", "unknown", "T", "some words " * 50, {})
    chunker = DocumentChunker(max_chunk_size=100, overlap=0)
    chunks = chunker.chunk_documents([doc])
    assert all(c.chunk_type == "generic" for c in chunks)
    stats = chunker.stats(chunks)
    assert stats["total_chunks"] == len(chunks)
    assert stats["chunks_by_type"]["generic"] == len(chunks)


# --------------------------------------------------------------- normalizer

def test_normalizer_abbreviation_expansion():
    n = MedicalTermNormalizer()
    out = n.normalize_text("Treatment for pt with MI and HTN")
    assert "myocardial infarction" in out
    assert "hypertension" in out
    assert "patient" in out


def test_normalizer_longer_abbreviation_wins():
    n = MedicalTermNormalizer()
    out = n.normalize_text("T2DM management")
    assert "type 2 diabetes mellitus" in out
    assert "type 1" not in out


def test_normalizer_brand_rewrite():
    n = MedicalTermNormalizer()
    n.drug_mapping = {"ibuprofen": ["Advil", "Motrin"]}
    out = n.normalize_text("Does Advil help?", expand_abbreviations=False)
    assert "ibuprofen (Advil)" in out


def test_normalizer_condition_synonyms():
    n = MedicalTermNormalizer()
    out = n.normalize_text("high blood pressure and heart attack",
                           expand_abbreviations=False)
    assert "hypertension" in out
    assert "myocardial infarction" in out


def test_normalizer_extract_and_synonyms():
    n = MedicalTermNormalizer()
    n.drug_mapping = {"ibuprofen": ["Advil"]}
    terms = n.extract_medical_terms("Advil for GERD")
    assert "Advil (ibuprofen)" in terms["drugs"]
    assert "GERD" in terms["abbreviations"]
    syns = n.get_synonyms("GERD")
    assert "gastroesophageal reflux disease" in syns


def test_normalizer_build_drug_mapping_from_data():
    docs = [
        Document("openfda_1", "openfda", "", "", {"generic_name": "IBUPROFEN",
                                                  "brand_name": "Advil"}),
        Document("kaggle_1", "kaggle", "", "", {"generic_name": "ibuprofen",
                                                "drug_name": "Motrin",
                                                "brand_names": ["Motrin IB"]}),
    ]
    n = MedicalTermNormalizer()
    n.build_drug_mapping_from_data(docs)
    assert set(n.drug_mapping["ibuprofen"]) == {"Advil", "Motrin", "Motrin IB"}


def test_normalizer_mapping_round_trip(tmp_path):
    n = MedicalTermNormalizer()
    n.drug_mapping = {"a": ["B"]}
    path = tmp_path / "map.json"
    n.save_drug_mapping(str(path))
    m = MedicalTermNormalizer(drug_mapping_path=str(path))
    assert m.drug_mapping == {"a": ["B"]}


# --------------------------------------------------------------- query prep

def test_query_preprocessor_schema_and_cleaning():
    qp = QueryPreprocessor()
    result = qp.preprocess("What  are the side effects of aspirin?!?")
    assert set(result) == {"original", "cleaned", "normalized", "entities",
                           "medical_terms"}
    assert "  " not in result["cleaned"]
    assert "!" not in result["cleaned"]
    assert "?" in result["cleaned"]  # '?' is kept by the cleaning charset


def test_query_preprocessor_entities():
    qp = QueryPreprocessor()
    qp.normalizer.drug_mapping = {"aspirin": ["Bayer"]}
    result = qp.preprocess("Is aspirin safe for GERD patients?")
    labels = {e["label"] for e in result["entities"]}
    assert "DRUG" in labels
    assert "ABBREVIATION" in labels or "CONDITION" in labels


def test_query_preprocessor_search_query_selection():
    qp = QueryPreprocessor()
    pre = qp.preprocess("drugs for HTN")
    # normalization expands HTN -> hypertension; short enough to be preferred
    assert qp.select_search_query(pre) == pre["normalized"]

    # build a query whose expansion more than doubles the length
    pre2 = qp.preprocess("MI CHF CAD DM w/ w/o")
    assert len(pre2["normalized"]) >= len(pre2["cleaned"]) * 2
    assert qp.select_search_query(pre2) == pre2["cleaned"]


def test_query_keywords_protect_medical_stopwords():
    qp = QueryPreprocessor()
    kw = qp.get_query_keywords("What is the treatment for the flu?")
    assert "treatment" in kw  # medical stopword protected
    assert "what" not in kw
    assert "flu" in kw


def test_guarded_pattern_prefilter_never_false_negative():
    """GuardedPattern's first-word set check must skip only true no-hit
    texts: multi-word phrases, hyphenated terms and case variants all
    still match exactly as the raw alternation would."""
    from domain_rag_system_tpu.preprocessing.normalizer import _alternation

    terms = ["heart attack", "T2DM", "x-ray", "type 2 diabetes mellitus"]
    g = _alternation(terms)
    cases = [
        ("the patient had a Heart Attack yesterday", ["Heart Attack"]),
        ("history of t2dm and hypertension", ["t2dm"]),
        ("chest x-ray was clear", ["x-ray"]),
        ("Type 2 Diabetes Mellitus management", ["Type 2 Diabetes Mellitus"]),
        ("completely unrelated astronomy text", []),
        ("the word heartless does not match", []),  # \b guard holds
    ]
    for text, expected in cases:
        assert [m.group(0) for m in g.finditer(text)] == expected, text
    # sub on a no-hit text returns it unchanged without scanning
    assert g.sub(lambda m: "X", "nothing to see here") == "nothing to see here"
    assert g.sub(lambda m: "X", "an x-ray image") == "an X image"


def test_chunker_enforces_max_size_on_pathological_text():
    """Unsplittable text (non-Latin sentences, giant unbroken tokens) must
    still respect the max_chunk_size contract — over-long chunks silently
    lose content at the encoder's token cap."""
    from domain_rag_system_tpu.preprocessing import Document, DocumentChunker

    ch = DocumentChunker()
    cases = [
        Document(doc_id="d1", source="pubmed", title="t",
                 content="α βδε γζη θικ. " * 300),      # non-Latin sentences
        Document(doc_id="d2", source="pubmed", title="t",
                 content="x" * 100000),                  # one giant token
        Document(doc_id="d3", source="pubmed", title="t",
                 content="word " * 2000),                # plain long text
    ]
    for d in cases:
        for c in ch.chunk_documents([d]):
            assert len(c.text) <= ch.max_chunk_size * 1.2, \
                (d.doc_id, len(c.text))


def test_sentence_split_handles_non_latin_boundaries():
    from domain_rag_system_tpu.preprocessing.sentence_split import (
        split_sentences,
    )

    assert len(split_sentences("α βγ δ. " * 10)) == 10  # non-ASCII starts split
    assert len(split_sentences("Результат хороший. " * 5)) == 5
    # abbreviation protection still intact
    assert len(split_sentences("We used e.g. mice. They grew.")) == 2


def test_sentence_packing_counts_join_separators():
    """Short-sentence text must not overflow max_chunk_size via uncounted
    ' ' join separators (previously up to 1.33x over)."""
    from domain_rag_system_tpu.preprocessing import Document, DocumentChunker

    ch = DocumentChunker()
    d = Document(doc_id="d", source="pubmed", title="t", content="Ab. " * 400)
    for c in ch.chunk_documents([d]):
        assert len(c.text) <= ch.max_chunk_size, len(c.text)


def test_sentence_split_ignores_unicode_whitespace_starts():
    from domain_rag_system_tpu.preprocessing.sentence_split import (
        split_sentences,
    )

    # NBSP after the period: \s+ must not leave a Unicode space as the
    # "sentence start" char (a real mid-sentence continuation)
    assert len(split_sentences(
        "The dose was 5 mg.  per day it was increased.")) == 1


def test_overlap_carry_cannot_overflow_max_chunk_size():
    """The one-sentence overlap carry must be DROPPED when it no longer
    fits alongside the incoming sentence: carried(250) + incoming(400)
    used to emit a 651-char chunk (cap 512). The carry is repeated text,
    so dropping it loses nothing."""
    from domain_rag_system_tpu.preprocessing import DocumentChunker
    from domain_rag_system_tpu.preprocessing.documents import Document

    def sent(ch, n):
        base = "A" + ch * 3 + " "
        return (base * (n // 5 + 2))[: n - 1].rstrip() + "."

    doc = Document(doc_id="d", source="pubmed", title="t",
                   content=" ".join([sent("a", 200), sent("b", 250),
                                     sent("c", 400)]),
                   metadata={})
    chunker = DocumentChunker()
    chunks = chunker.chunk_documents([doc])
    assert all(len(c.text) <= chunker.max_chunk_size for c in chunks)
    # the 400-char sentence still lands in a chunk of its own
    assert any("Accc" in c.text for c in chunks)
