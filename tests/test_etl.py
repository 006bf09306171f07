"""ETL extractor tests (bioasq cleaner/corpus builder/sampler, openfda,
kaggle) using synthetic raw inputs and a fake fetch function."""

import json

import pytest

from domain_rag_system_tpu.etl.bioasq import (
    build_pubmed_corpus,
    clean_bioasq,
    sample_subset,
)
from domain_rag_system_tpu.etl.kaggle import (
    build_etl_chunks,
    build_test_queries,
    process_csv,
    split_side_effects,
)
from domain_rag_system_tpu.etl.openfda import extract_label, extract_openfda_corpus


# ----------------------------------------------------------------- bioasq

RAW_BIOASQ = {"questions": [
    {"id": "q1", "body": "What is X?", "type": "factoid",
     "documents": ["http://www.ncbi.nlm.nih.gov/pubmed/111",
                   "http://example.com/not-pubmed"],
     "snippets": [{"document": "http://www.ncbi.nlm.nih.gov/pubmed/111",
                   "text": "X is a thing.", "beginSection": "sections.0",
                   "endSection": "sections.0"}],
     "concepts": ["c"], "triples": ["t"],
     "ideal_answer": ["X is a thing."]},
    {"id": "q2", "body": "Dead links only", "type": "yesno",
     "documents": ["http://example.com/invalid"], "snippets": []},
]}


def test_clean_bioasq_drops_invalid():
    cleaned = clean_bioasq(RAW_BIOASQ)
    assert len(cleaned["questions"]) == 1
    q = cleaned["questions"][0]
    assert q["documents"] == ["http://www.ncbi.nlm.nih.gov/pubmed/111"]
    assert q["snippets"][0]["beginSection"] == "abstract"
    assert "concepts" not in q


def test_build_pubmed_corpus_with_fake_fetch_and_repair():
    calls = []

    def flaky_fetch(pmids):
        calls.append(list(pmids))
        if len(calls) == 1:
            # first round: only return the first pmid
            return {pmids[0]: {"title": "T1", "abstract": "A1"}}
        return {p: {"title": f"T{p}", "abstract": f"A{p}"} for p in pmids}

    corpus = build_pubmed_corpus(["1", "2", "3"], fetch_fn=flaky_fetch,
                                 rate_limit_s=0.0)
    assert len(corpus) == 3
    by_id = {c["id"]: c for c in corpus}
    assert by_id["1"]["title"] == "T1"
    assert by_id["2"]["title"] == "T2"  # repaired in round 2
    assert len(calls) >= 2
    assert by_id["3"]["link"].endswith("/pubmed/3")


def test_sample_subset_deterministic():
    questions = {"questions": [
        {"id": f"q{i}", "body": "b", "type": t,
         "documents": [f"http://www.ncbi.nlm.nih.gov/pubmed/{i}"],
         "snippets": [], "ideal_answer": [], "exact_answer": []}
        for i, t in enumerate(["yesno", "factoid", "list", "summary"] * 10)
    ]}
    corpus = [{"id": str(i), "title": f"t{i}", "abstract": "a", "link": ""}
              for i in range(100)]
    sub1, corp1 = sample_subset(questions, corpus, per_type=5, min_corpus=50)
    sub2, corp2 = sample_subset(questions, corpus, per_type=5, min_corpus=50)
    assert [q["id"] for q in sub1["questions"]] == [q["id"] for q in sub2["questions"]]
    assert len(sub1["questions"]) == 20
    assert len(corp1) == 50
    assert [c["id"] for c in corp1] == [c["id"] for c in corp2]


# ----------------------------------------------------------------- openfda

def test_extract_label_field_prefixes_roundtrip_with_chunker():
    record = {
        "id": "abc", "set_id": "s", "effective_time": "20240101", "version": "1",
        "openfda": {"brand_name": ["Tylenol"], "generic_name": ["ACETAMINOPHEN"]},
        "active_ingredient": ["Acetaminophen 500 mg"],
        "indications_and_usage": ["temporary relief of minor aches"],
        "warnings": ["Liver warning: severe liver damage may occur"],
    }
    out = extract_label(record)
    assert out["brand_name"] == "Tylenol"
    assert out["metadata"]["has_warnings"] is True

    # The produced text must re-split through the chunker's section parser.
    from domain_rag_system_tpu.preprocessing import Document, DocumentChunker

    doc = Document("openfda_abc", "openfda", "Tylenol (ACETAMINOPHEN)",
                   out["text"], {})
    chunk_types = {c.chunk_type for c in DocumentChunker().chunk_documents([doc])}
    assert {"drug_names", "active_ingredients", "indications", "warnings"} <= chunk_types


def test_extract_openfda_corpus_limit(tmp_path):
    dump = {"results": [
        {"id": str(i), "openfda": {"brand_name": [f"Drug{i}"]},
         "purpose": [f"purpose {i}"]} for i in range(10)
    ]}
    p = tmp_path / "dump.json"
    p.write_text(json.dumps(dump))
    corpus = extract_openfda_corpus([str(p)], limit=4)
    assert len(corpus) == 4


# ----------------------------------------------------------------- kaggle

CSV_TEXT = """drug_name,medical_condition,generic_name,drug_classes,brand_names,rx_otc,pregnancy_category,csa,alcohol,rating,activity,no_of_reviews,side_effects,medical_condition_description,related_drugs,drug_link,medical_condition_url
Advil,Pain,ibuprofen,"NSAIDs","Advil, Motrin",OTC,C,N,X,7.5,87%,120,"Serious side effects may occur. Call your doctor at once if you have chest pain; shortness of breath. Common side effects may include nausea; heartburn or dizziness.","Pain is an unpleasant sensation.","naproxen: https://x|acetaminophen: https://y",https://drug,https://cond
Tylenol,Pain,acetaminophen,Analgesics,Tylenol,OTC,B,N,N,6.9,80%,95,"Common side effects may include nausea; headache.","Pain is an unpleasant sensation.","ibuprofen: https://z",https://drug2,https://cond
"""


def test_process_csv(tmp_path):
    p = tmp_path / "drugs.csv"
    p.write_text(CSV_TEXT)
    records = process_csv(str(p))
    assert len(records) == 2
    advil = records[0]
    assert len(advil["doc_id"]) == 32
    assert advil["pregnancy_category"] == "Risk cannot be ruled out"
    assert advil["pregnancy_category_raw"] == "C"
    assert "chest pain" in " ".join(advil["side_effects_structured"]["serious"])
    assert "nausea" in " ".join(advil["side_effects_structured"]["common"])
    assert advil["related_drugs"][0]["name"] == "naproxen"
    assert advil["brand_names"] == ["Advil", "Motrin"]


def test_split_side_effects_empty():
    assert split_side_effects("") == {"serious": [], "common": []}


def test_etl_chunks_and_queries(tmp_path):
    p = tmp_path / "drugs.csv"
    p.write_text(CSV_TEXT)
    records = process_csv(str(p))
    chunks = build_etl_chunks(records)
    kinds = {c["kind"] for c in chunks}
    assert {"facts", "side_effects_serious", "side_effects_common",
            "condition_overview", "related"} <= kinds
    assert all(len(c["chunk_id"]) == 32 for c in chunks)

    queries = build_test_queries(records)
    # per-record name-keyed types + per-condition + per-class queries,
    # alternating canonical / held-out paraphrase templates
    assert len(queries) >= 8
    assert {q["type"] for q in queries} >= {
        "drug_side_effects", "condition_treatment", "drug_safety",
        "drug_class_info", "related_drugs", "condition_overview",
        "drug_rating", "class_based_options"}
    # cross-name types exist when generic/alt-brand names differ
    assert any(q["type"] == "generic_name_side_effects" for q in queries)
    assert {q["template"] for q in queries} == {"canonical", "paraphrase"}
    # every real drug gets its name-keyed queries
    for r in records:
        assert any(r["drug_name"] in q["body"] for q in queries)
    # doc-level gt present (quirk-1 fix) alongside faithful chunk gt
    for q in queries:
        if q["gt_chunk_ids"]:
            assert q["documents"]


def test_kaggle_records_load_through_data_loader(tmp_path):
    p = tmp_path / "drugs.csv"
    p.write_text(CSV_TEXT)
    records = process_csv(str(p), output_path=str(tmp_path / "docs.json"))
    from domain_rag_system_tpu.preprocessing import DataLoader

    docs = DataLoader(kaggle_path=str(tmp_path / "docs.json")).load_kaggle()
    assert len(docs) == 2
    assert "=== SIDE EFFECTS ===" in docs[0].content


def test_shadow_distractors_are_hard_but_disjoint(tmp_path):
    p = tmp_path / "drugs.csv"
    p.write_text(CSV_TEXT)
    records = process_csv(str(p))
    from domain_rag_system_tpu.etl.kaggle import make_distractor_records

    dis = make_distractor_records(records, n=20, shadows_per_record=3)
    shadows = [d for d in dis if d.get("shadow_of")]
    assert len(shadows) == 3 * len(records)
    by_doc = {r["doc_id"]: r for r in records}
    real_names = {r["drug_name"].lower() for r in records}
    real_conds = {r["medical_condition"].lower() for r in records}
    real_classes = {c.lower() for r in records for c in r["drug_classes"]}
    for s in shadows:
        src = by_doc[s["shadow_of"]]
        # near-duplicate sections: side-effect lists copied VERBATIM
        assert s["side_effects_structured"] == src["side_effects_structured"]
        # ...but never a legitimate answer to any rule-keyed query
        assert s["drug_name"].lower() not in real_names
        assert s["medical_condition"].lower() not in real_conds
        assert all(c.lower() not in real_classes for c in s["drug_classes"])
    # determinism (the eval corpus must be reproducible)
    again = make_distractor_records(records, n=20, shadows_per_record=3)
    assert [d["doc_id"] for d in again] == [d["doc_id"] for d in dis]


def test_openfda_generated_queries_complete_gt():
    from domain_rag_system_tpu.etl.openfda import build_openfda_queries

    corpus = [
        {"id": "a1", "brand_name": "PainAway", "generic_name": "ACETAMINOPHEN",
         "text": "Drug names: PainAway (ACETAMINOPHEN)\n"
                 "Active ingredients: Acetaminophen 500 mg\n"
                 "Warning information: Liver warning applies.\n"
                 "Dosage and administration: take 2 tablets",
         "metadata": {"has_warnings": True, "has_dosage": True,
                      "has_indications": False}},
        {"id": "a2", "brand_name": "MAPAP", "generic_name": "ACETAMINOPHEN",
         "text": "Drug names: MAPAP (ACETAMINOPHEN)\n"
                 "Active ingredients: Acetaminophen 325 mg\n"
                 "Indications and usage: pain reliever",
         "metadata": {"has_warnings": False, "has_dosage": False,
                      "has_indications": True}},
        {"id": "b1", "brand_name": "", "generic_name": "",
         "text": "Active ingredients: Ethyl Alcohol 70vv\n"
                 "Warning information: flammable",
         "metadata": {"has_warnings": True}},
    ]
    qs = build_openfda_queries(corpus, min_queries=1)
    assert qs
    assert {q["template"] for q in qs} == {"canonical", "paraphrase"}
    # ingredient rule: acetaminophen must ground-truth BOTH products
    ing = [q for q in qs if q["type"] == "ingredient"
           and "acetaminophen" in q["body"].lower()]
    assert ing and sorted(ing[0]["documents"]) == ["a1", "a2"]
    # name-keyed queries never include unrelated docs
    for q in qs:
        if q["type"] != "ingredient":
            assert "b1" not in q["documents"]


def test_same_domain_shadows_and_gt_inclusion(tmp_path):
    """Round-4 hard decoys: same condition/class, real drug name embedded
    in the decoy's side-effect text, included in condition/class-keyed gt
    but never in name-keyed gt."""
    p = tmp_path / "drugs.csv"
    p.write_text(CSV_TEXT)
    records = process_csv(str(p))
    from domain_rag_system_tpu.etl.kaggle import make_distractor_records

    hard = make_distractor_records(records, n=0, hard_per_record=2)
    assert len(hard) == 2 * len(records)
    by_doc = {r["doc_id"]: r for r in records}
    real_names = {r["drug_name"].lower() for r in records}
    for s in hard:
        src = by_doc[s["shadow_of"]]
        assert s["same_domain"] is True and s["distractor"] is True
        assert s["medical_condition"] == src["medical_condition"]
        assert s["drug_classes"] == src["drug_classes"]
        # the real drug's name occurs inside the decoy's text
        assert src["drug_name"] in s["side_effects_raw"]
        assert s["drug_name"].lower() not in real_names

    queries = build_test_queries(records + hard)
    hard_ids = {s["doc_id"] for s in hard}
    for q in queries:
        hits = set(q["documents"]) & hard_ids
        if q["type"] in ("condition_treatment", "condition_overview",
                         "class_based_options", "pregnancy_safe_options",
                         "otc_options", "condition_best_rated"):
            continue  # same-domain records MAY legitimately appear
        assert not hits, (q["type"], hits)
    # condition-keyed gt DOES include the same-domain records (they
    # truthfully claim the condition inside this corpus)
    ct = [q for q in queries if q["type"] == "condition_treatment"]
    assert any(set(q["documents"]) & hard_ids for q in ct)


def test_name_keyed_gt_complete_across_aliases(tmp_path):
    """Two records of the same drug under different primary names: the
    name-keyed gt must include both (round-4 completeness fix)."""
    p = tmp_path / "drugs.csv"
    p.write_text(CSV_TEXT)
    records = process_csv(str(p))
    twin = dict(records[0])
    twin["doc_id"] = "f" * 32
    twin["drug_name"] = "TwinBrand"
    twin["generic_name"] = records[0]["drug_name"]  # generic = first's name
    twin["brand_names"] = ["TwinBrand"]
    queries = build_test_queries(records + [twin])
    side = [q for q in queries if q["type"] == "drug_side_effects"
            and records[0]["drug_name"] in q["body"]]
    assert side, "name-keyed query for the aliased drug must exist"
    # gt covers BOTH records of that drug (exact generic-name match)
    assert {records[0]["doc_id"], twin["doc_id"]} <= set(side[0]["documents"])


def test_merge_records_collision_drop(tmp_path):
    p = tmp_path / "drugs.csv"
    p.write_text(CSV_TEXT)
    records = process_csv(str(p))
    from domain_rag_system_tpu.etl.kaggle import merge_records

    # secondary colliding via brand name, generic, and a fresh record
    collide_brand = {"doc_id": "x1", "drug_name": "Other",
                     "generic_name": "other",
                     "brand_names": list(records[0].get("brand_names")
                                         or [records[0]["drug_name"]])}
    collide_generic = {"doc_id": "x2",
                       "drug_name": records[0]["generic_name"]
                       or records[0]["drug_name"],
                       "generic_name": "", "brand_names": []}
    fresh = {"doc_id": "x3", "drug_name": "Zanthex",
             "generic_name": "zanthex", "brand_names": ["Zanthex"]}
    merged = merge_records(records, [collide_brand, collide_generic, fresh])
    ids = {r["doc_id"] for r in merged}
    assert "x3" in ids and "x1" not in ids and "x2" not in ids
    assert len(merged) == len(records) + 1


def test_openfda_distractor_invariants():
    """Shadow/decoy construction contracts (round-5 hard eval): invented
    names, real-name scrubbed from shadow bodies except the confusable
    warning, donor-swapped ingredient lines kept truthful, and query
    generation never KEYS on a distractor."""
    from domain_rag_system_tpu.etl.openfda import (
        build_openfda_queries,
        make_openfda_distractors,
    )

    corpus = [
        {"id": f"r{i}", "set_id": "", "brand_name": f"Realdrug{i}",
         "generic_name": f"realgen{i}",
         "text": f"Drug names: Realdrug{i}\n"
                 f"Active ingredients: compound{i} 2.5\n"
                 f"Warning information: do not exceed the Realdrug{i} dose.\n"
                 f"Dosage and administration: twice daily.",
         "metadata": {"has_warnings": True, "has_dosage": True,
                      "has_indications": False}}
        for i in range(6)
    ]
    dis = make_openfda_distractors(corpus, n=10, shadows_per_record=2)
    shadows = [d for d in dis if d["metadata"].get("shadow_of")]
    decoys = [d for d in dis if not d["metadata"].get("shadow_of")]
    assert len(shadows) == 12 and len(decoys) == 10
    real_names = {c["brand_name"] for c in corpus}
    for s in shadows:
        assert s["brand_name"] not in real_names
        src_name = next(c["brand_name"] for c in corpus
                        if c["id"] == s["metadata"]["shadow_of"])
        first_line = s["text"].split("\n", 1)[0]
        assert src_name not in first_line
        # the real name survives ONLY in the confusable warning line
        hits = [ln for ln in s["text"].split("\n") if src_name in ln]
        assert len(hits) == 1 and "Do not combine" in hits[0]
        # donor-swapped ingredient line is a real corpus line (truthful)
        ing = next(ln for ln in s["text"].split("\n")
                   if ln.startswith("Active ingredients:"))
        assert any(ing in c["text"] for c in corpus)

    qs = build_openfda_queries(corpus + dis, min_queries=1)
    decoy_names = {d["brand_name"].lower() for d in dis}
    assert qs, "generation must still produce queries"
    for q in qs:
        assert not any(n in q["body"].lower() for n in decoy_names)
