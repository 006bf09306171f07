"""Structured query intent → metadata constraints (attribute-aware retrieval).

Covers the round-5 feature chain: FilterSet predicates ($in / $contains /
list membership) → StructuredQueryParser detection rules → fused-program
hard masks & soft boosts → best-rated metadata ranking. Reference bar:
Qdrant filter clauses at ``src/indexing/vector_indexer.py:185-196`` and the
attribute-keyed query suite at ``data/kaggle_drug_data/test_queries.py``.
"""

import pytest

from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.indexing.filters import FilterSet
from domain_rag_system_tpu.models import MedicalEmbedder
from domain_rag_system_tpu.pipeline import RetrievalPipeline
from domain_rag_system_tpu.preprocessing import Chunk, StructuredQueryParser


def drug_chunks():
    """A kaggle-shaped toy corpus: 6 drugs × (facts + side-effects) chunks
    with the metadata schema of ``preprocessing/data_loader.py:100-117``."""
    drugs = [
        # name, condition, classes, rx_otc, preg_raw, rating, reviews
        ("Tretinax", "Acne", ["Topical acne agents"], "Rx", "C", 8.0, 120),
        ("Benzogel", "Acne", ["Topical acne agents"], "OTC", "B", 6.5, 80),
        ("Clearasol", "Acne", ["Topical keratolytics"], "Rx/OTC", "A", 7.2, 40),
        ("Doxytab", "Acne", ["Tetracyclines"], "Rx", "D", 9.1, 300),
        ("Flumist", "Colds Flu", ["Upper respiratory combinations"],
         "OTC", "C", 5.0, 20),
        ("Painex", "Pain", ["NSAIDs"], "OTC", "B", 8.8, 500),
    ]
    chunks = []
    for i, (name, cond, classes, rx, preg, rating, reviews) in enumerate(drugs):
        meta = {
            "drug_name": name,
            "generic_name": name.lower(),
            "medical_condition": cond,
            "drug_classes": classes,
            "brand_names": [name],
            "rx_otc": rx,
            "pregnancy_category_raw": preg,
            "rating": rating,
            "no_of_reviews": reviews,
        }
        chunks.append(Chunk(
            chunk_id=f"k{i}_facts", doc_id=f"kaggle_{name.lower()}",
            source="kaggle", chunk_type="facts",
            text=f"{name} treats {cond}. Drug class: {', '.join(classes)}. "
                 f"Availability: {rx}. Rating {rating}/10.",
            metadata=dict(meta)))
        chunks.append(Chunk(
            chunk_id=f"k{i}_se", doc_id=f"kaggle_{name.lower()}",
            source="kaggle", chunk_type="side_effects",
            text=f"{name} side effects include dryness and irritation "
                 f"when treating {cond}.",
            metadata=dict(meta)))
    return chunks


@pytest.fixture
def kpipe():
    embedder = MedicalEmbedder(dim=256)
    hybrid = HybridIndex(dense_index=DenseIndex(embedder, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(drug_chunks())
    return RetrievalPipeline(hybrid)


# ----------------------------------------------------------- FilterSet


def test_filterset_predicates():
    chunks = drug_chunks()
    fs = FilterSet(chunks)
    m_in = fs.mask({"pregnancy_category_raw": {"$in": ["A", "B"]}})
    kept = {chunks[i].metadata["drug_name"] for i in range(len(chunks))
            if m_in[i]}
    assert kept == {"Benzogel", "Clearasol", "Painex"}

    m_sub = fs.mask({"rx_otc": {"$contains": "OTC"}})
    kept = {chunks[i].metadata["drug_name"] for i in range(len(chunks))
            if m_sub[i]}
    # substring match covers the composite "Rx/OTC" value
    assert kept == {"Benzogel", "Clearasol", "Flumist", "Painex"}

    # scalar against a LIST field = membership (Qdrant MatchValue on arrays)
    m_list = fs.mask({"drug_classes": "Tetracyclines"})
    kept = {chunks[i].metadata["drug_name"] for i in range(len(chunks))
            if m_list[i]}
    assert kept == {"Doxytab"}

    assert fs.any_match({"rx_otc": {"$contains": "OTC"}})
    assert not fs.any_match({"rx_otc": "injectable"})
    with pytest.raises(ValueError):
        fs.mask({"rx_otc": {"$regex": "x"}})


# -------------------------------------------------------------- parser


def test_parser_attribute_detection():
    parser = StructuredQueryParser(drug_chunks())
    assert parser.active

    spec = parser.parse("What can a pregnant patient take for Acne?")
    assert spec["hard"] == {"pregnancy_category_raw": {"$in": ["A", "B"]}} \
        or "pregnancy_category_raw" in (spec["hard"] or {})

    spec = parser.parse("Which OTC options exist for Acne?")
    assert "rx_otc" in spec["hard"]

    # naming a drug suppresses attribute constraints (drug_safety semantics:
    # asking ABOUT Doxytab must rank Doxytab, whatever its category)
    spec = parser.parse("Is Doxytab safe during pregnancy?")
    assert spec is None or not (spec["hard"] or {})

    # condition mention → soft boost by default
    spec = parser.parse("What drugs treat Acne?")
    assert spec and spec["soft"] == {"medical_condition": "Acne"}

    # best-rated intent
    spec = parser.parse("Which drugs are best rated for Acne?")
    assert spec["rank_by_rating"]

    # punctuation-robust value match ("Colds Flu" vs "Colds & Flu" style)
    spec = parser.parse("what can I take over the counter for colds flu?")
    assert "rx_otc" in (spec["hard"] or {})


def test_parser_inert_without_metadata(toy_chunks):
    parser = StructuredQueryParser(toy_chunks)
    assert not parser.active
    assert parser.parse("Which OTC options exist for pain?") is None


def test_parser_mode_overrides():
    parser = StructuredQueryParser(
        drug_chunks(), modes={"otc": "soft", "rating": "off"})
    spec = parser.parse("Which OTC options are best rated for Acne?")
    assert "rx_otc" in (spec["soft"] or {})
    assert not (spec["hard"] or {})
    assert not spec["rank_by_rating"]


# -------------------------------------------------------- end-to-end


def test_hard_filter_end_to_end(kpipe):
    out = kpipe.query("What can a pregnant patient take for Acne?",
                      top_k=5, group_by_doc=True, structured=True)
    names = [r["metadata"]["drug_name"] for r in out["results"]]
    assert names, "hard filter must not blank the result set"
    assert all(r["metadata"]["pregnancy_category_raw"] in ("A", "B")
               for r in out["results"])
    # acne drugs outrank the non-acne qualifying drug
    assert set(names[:2]) == {"Benzogel", "Clearasol"}
    assert out["structured"]["hard"] is not None

    # without structured parsing the unfiltered ranking can include any
    # category — the two runs must differ on this corpus
    base = kpipe.query("What can a pregnant patient take for Acne?",
                       top_k=5, group_by_doc=True)
    assert "structured" not in base


def test_otc_filter_end_to_end(kpipe):
    out = kpipe.query("Which OTC options exist for Acne?", top_k=5,
                      group_by_doc=True, structured=True)
    assert all("OTC" in r["metadata"]["rx_otc"] for r in out["results"])


def test_soft_condition_boost(kpipe):
    # "dryness irritation" matches every side-effect chunk equally; the
    # condition boost must pull Acne-metadata docs ahead
    out = kpipe.query("dryness irritation treatment for Acne", top_k=3,
                      group_by_doc=True, structured=True,
                      structured_modes={"condition": "soft"},
                      structured_boost_sparse=2.0,
                      structured_boost_dense=0.5)
    conds = [r["metadata"]["medical_condition"] for r in out["results"]]
    assert conds.count("Acne") == 3


def test_rating_ranking(kpipe):
    out = kpipe.query("Which drugs are best rated for Acne?", top_k=4,
                      group_by_doc=True, structured=True)
    results = out["results"]
    # reference rating-score formula (test_queries.py:119-127):
    # rating*100 + no_of_reviews, descending
    scores = [r["metadata"]["rating"] * 100 + r["metadata"]["no_of_reviews"]
              for r in results]
    assert scores == sorted(scores, reverse=True)
    # best-rated + detected condition hard-filters to the qualifying set:
    # Painex (Pain, score 1380) must NOT outrank the acne drugs even though
    # its rating score is the corpus maximum
    assert all(r["metadata"]["medical_condition"] == "Acne" for r in results)
    assert results[0]["metadata"]["drug_name"] == "Doxytab"


def test_structured_noop_on_plain_corpus(toy_chunks):
    embedder = MedicalEmbedder(dim=256)
    hybrid = HybridIndex(dense_index=DenseIndex(embedder, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(toy_chunks)
    pipe = RetrievalPipeline(hybrid)
    q = "over the counter options for pain"
    plain = pipe.query(q, top_k=5)
    structured = pipe.query(q, top_k=5, structured=True)
    assert [r["chunk_id"] for r in plain["results"]] == \
        [r["chunk_id"] for r in structured["results"]]


def test_explicit_filters_win_over_parser(kpipe):
    out = kpipe.query("Which OTC options exist for Acne?", top_k=5,
                      structured=True,
                      filters={"rx_otc": "Rx"})
    # user's explicit rx_otc constraint overrides the parser's $contains
    assert all(r["metadata"]["rx_otc"] == "Rx" for r in out["results"])


def test_section_intent_overview_only():
    """Overview section intent: fires only with a detected condition and
    emits a soft chunk_type preference; the measured-harmful side-effect/
    related intents must NOT fire (results/section_intent_ab.json)."""
    chunks = drug_chunks()
    # add an overview-kind chunk so the intent's type is present
    meta = dict(chunks[0].metadata)
    chunks.append(Chunk(
        chunk_id="ov0", doc_id=chunks[0].doc_id, source="kaggle",
        chunk_type="condition_info",
        text="Acne is a skin condition producing pimples.",
        metadata=meta))
    parser = StructuredQueryParser(chunks)

    spec = parser.parse("What is Acne?")
    assert spec and spec["soft"].get("chunk_type") == "condition_info"

    # no condition detected -> overview intent must not fire
    spec = parser.parse("What is the best approach?")
    assert spec is None or "chunk_type" not in (spec["soft"] or {})

    # side-effect phrasing must NOT emit a section preference (measured
    # harmful: drug-unconditional boosts invert name-keyed rankings)
    spec = parser.parse("What are the side effects of Tretinax?")
    assert spec is None or "chunk_type" not in (spec["soft"] or {})


def test_rating_split_dispatch_preserves_cobatch_semantics(kpipe):
    """Mixed rating/non-rating batches split into two dispatches: the
    non-rating queries' results must be BIT-IDENTICAL to running them
    without the rating query in the batch (a shared deeper fetch_k would
    silently change their fused pool), and order is reassembled."""
    plain_q = "What drugs treat Pain?"
    rating_q = "Which drugs are best rated for Acne?"
    solo = kpipe.query_batch([plain_q], top_k=4, group_by_doc=True,
                             structured=True)
    mixed = kpipe.query_batch([plain_q, rating_q, plain_q], top_k=4,
                              group_by_doc=True, structured=True)
    assert [r["chunk_id"] for r in mixed[0]["results"]] == \
        [r["chunk_id"] for r in solo[0]["results"]]
    assert [r["chunk_id"] for r in mixed[2]["results"]] == \
        [r["chunk_id"] for r in solo[0]["results"]]
    # the rating query keeps its rating-ordered semantics in the middle slot
    scores = [r["metadata"]["rating"] * 100 + r["metadata"]["no_of_reviews"]
              for r in mixed[1]["results"]]
    assert scores == sorted(scores, reverse=True)
    assert all(r["metadata"]["medical_condition"] == "Acne"
               for r in mixed[1]["results"])
    # streaming executor handles composite (split) handles in its window
    stream = kpipe.query_stream([plain_q, rating_q, plain_q], batch_size=3,
                                top_k=4, group_by_doc=True, structured=True)
    for a, b in zip(stream, mixed):
        assert [r["chunk_id"] for r in a["results"]] == \
            [r["chunk_id"] for r in b["results"]]


def test_structured_survives_bundle_roundtrip(tmp_path, kpipe):
    """Metadata-driven structured retrieval must work identically on an
    index reloaded from a persistence bundle (chunk metadata — conditions,
    attributes, ratings — travels through save_index/load_index)."""
    from domain_rag_system_tpu.persistence import (
        load_index,
        save_index,
        snapshot_index,
    )

    q = "Which OTC options exist for Acne?"
    before = kpipe.query(q, top_k=5, group_by_doc=True, structured=True)
    save_index(snapshot_index(kpipe.index), tmp_path / "bundle")
    restored = load_index(tmp_path / "bundle")
    pipe2 = RetrievalPipeline(restored)
    after = pipe2.query(q, top_k=5, group_by_doc=True, structured=True)
    assert [r["chunk_id"] for r in after["results"]] == \
        [r["chunk_id"] for r in before["results"]]
    assert after["structured"]["hard"] == before["structured"]["hard"]


def test_drug_name_family(kpipe):
    """Queries naming a drug get a soft preference over the record's
    all_names metadata — a brand alias that never occurs in section text
    still ranks its record (results/drug_name_ab.json)."""
    parser = kpipe.structured_parser()
    spec = parser.parse("What are the side effects of Doxytab?")
    assert spec and spec["soft"].get("all_names") == "doxytab"

    out = kpipe.query("What are the side effects of Doxytab?", top_k=2,
                      group_by_doc=True, structured=True,
                      structured_boost_sparse=1.5)
    assert out["results"][0]["metadata"]["drug_name"] == "Doxytab"

    # generic-name phrasing hits the same record via all_names
    out2 = kpipe.query("doxytab adverse reactions", top_k=2,
                       group_by_doc=True, structured=True,
                       structured_boost_sparse=1.5)
    assert out2["results"][0]["metadata"]["drug_name"] == "Doxytab"


def test_vocab_matcher_semantics():
    """_VocabMatcher: token-flexible matching, longest-value-wins, and the
    first-token prefilter never causes a false negative."""
    from domain_rag_system_tpu.preprocessing.structured import _VocabMatcher

    m = _VocabMatcher(["Diabetes (Type 2)", "Colds & Flu", "Pain"])
    # punctuation-flexible both directions
    assert m.find("manage diabetes type 2 daily") == "Diabetes (Type 2)"
    assert m.find("remedies for colds flu season") == "Colds & Flu"
    # longest VALUE wins when several match
    m2 = _VocabMatcher(["Pain", "Chronic Pain"])
    assert m2.find("treat chronic pain now") == "Chronic Pain"
    # prefilter: no vocab first-token present -> no scan, no match
    assert m.find("completely unrelated text") is None
    assert not m.search("nothing here")
    assert m.search("PAIN relief")  # case-insensitive
    # empty vocab is inert
    empty = _VocabMatcher([])
    assert not empty and empty.find("anything") is None
