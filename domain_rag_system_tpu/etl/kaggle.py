"""drugs.com (Kaggle) ETL: CSV → doc records, ETL chunks, and test queries.

Capability parity with the reference tooling:
  * :func:`process_csv` — ``data/kaggle_drug_data/data_extractor.py:56-199``:
    md5 doc ids over ``drug_name|medical_condition``, serious/common
    side-effect heuristic extraction, pregnancy-category normalization;
  * :func:`build_etl_chunks` — ``:203-245``: the ETL's own 5 chunk kinds
    (facts / side_effects_serious / side_effects_common / condition_overview
    / related) with md5 chunk ids;
  * :func:`build_test_queries` — ``test_queries.py:84-187``: fixed
    per-type queries with rule-based ground-truth.

Quirk-1 fix (SURVEY.md §2.3): the reference's ground truth uses the ETL's
md5 *chunk* ids while the retrieval system emits its own chunk ids — the id
spaces are disjoint and every metric scores 0.0. Queries built here carry
BOTH ``gt_chunk_ids`` (faithful) and ``documents`` (doc-level ids the
evaluation runners score against), so the fixed evaluation is meaningful
while the faithful id space remains available.
"""

from __future__ import annotations

import csv
import hashlib
import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

_PREGNANCY_CATEGORIES = {
    "A": "No risk in human studies",
    "B": "No risk in animal studies",
    "C": "Risk cannot be ruled out",
    "D": "Positive evidence of risk",
    "X": "Contraindicated in pregnancy",
    "N": "Not classified",
}

_SERIOUS_MARKERS = re.compile(
    r"(serious side effects|call your doctor|emergency medical|allergic reaction)",
    re.IGNORECASE)
_COMMON_MARKERS = re.compile(
    r"(common side effects|less serious|may include)", re.IGNORECASE)


def _md5(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def split_side_effects(raw: str) -> Dict[str, List[str]]:
    """Heuristic serious/common split of a raw side-effects blob.

    Sentences after a serious marker accumulate as serious, after a common
    marker as common; list items are split on ``;`` / `` or `` / newlines.
    """
    serious: List[str] = []
    common: List[str] = []
    if not raw:
        return {"serious": [], "common": []}

    mode = None
    for sentence in re.split(r"(?<=[.!?])\s+|\n", raw):
        sentence = sentence.strip()
        if not sentence:
            continue
        if _SERIOUS_MARKERS.search(sentence):
            mode = "serious"
        elif _COMMON_MARKERS.search(sentence):
            mode = "common"
        items = [i.strip(" .;") for i in re.split(r";| or |, and ", sentence)
                 if 2 < len(i.strip(" .;")) < 80]
        if mode == "serious":
            serious.extend(items)
        elif mode == "common":
            common.extend(items)
    return {
        "serious": list(dict.fromkeys(serious))[:15],
        "common": list(dict.fromkeys(common))[:15],
    }


def process_csv(csv_path: str, output_path: Optional[str] = None) -> List[Dict]:
    """drugs.com CSV → extracted doc records (extracted_docs.json schema)."""
    records: List[Dict] = []
    with open(csv_path, "r", encoding="utf-8", newline="") as f:
        for row in csv.DictReader(f):
            drug_name = (row.get("drug_name") or "").strip()
            condition = (row.get("medical_condition") or "").strip()
            if not drug_name or not condition:
                continue
            raw_se = (row.get("side_effects") or "").strip()
            preg_raw = (row.get("pregnancy_category") or "").strip()
            brand_names = [b.strip() for b in
                           (row.get("brand_names") or "").split(",") if b.strip()]
            drug_classes = [c.strip() for c in
                            (row.get("drug_classes") or "").split(",") if c.strip()]
            related = []
            for part in (row.get("related_drugs") or "").split("|"):
                name = part.split(":", 1)[0].strip()
                if name:
                    related.append({"name": name})

            def _num(key):
                try:
                    return float(row[key]) if row.get(key) else None
                except ValueError:
                    return None

            records.append({
                "doc_id": _md5(f"{drug_name}|{condition}"),
                "drug_name": drug_name,
                "generic_name": (row.get("generic_name") or "").strip(),
                "medical_condition": condition,
                "drug_classes": drug_classes,
                "brand_names": brand_names,
                "rx_otc": (row.get("rx_otc") or "").strip(),
                "pregnancy_category": _PREGNANCY_CATEGORIES.get(preg_raw, preg_raw),
                "pregnancy_category_raw": preg_raw,
                "csa": (row.get("csa") or "").strip(),
                "alcohol": (row.get("alcohol") or "").strip(),
                "rating": _num("rating"),
                "activity": (row.get("activity") or "").strip(),
                "no_of_reviews": _num("no_of_reviews"),
                "side_effects_structured": split_side_effects(raw_se),
                "side_effects_raw": raw_se,
                "condition_summary": (row.get("medical_condition_description") or "").strip(),
                "related_drugs": related,
                "links": {"drug": (row.get("drug_link") or "").strip(),
                          "condition": (row.get("medical_condition_url") or "").strip()},
            })
    log.info("processed %d drugs.com records from %s", len(records), csv_path)
    if output_path:
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(records, f, ensure_ascii=False)
    return records


def build_etl_chunks(records: List[Dict]) -> List[Dict]:
    """The ETL's own 5 chunk kinds with md5 chunk ids (faithful id space)."""
    chunks: List[Dict] = []

    def add(doc: Dict, kind: str, text: str) -> None:
        if not text.strip():
            return
        chunks.append({
            "chunk_id": _md5(f"{doc['doc_id']}|{kind}"),
            "doc_id": doc["doc_id"],
            "kind": kind,
            "text": text.strip(),
            "drug_name": doc["drug_name"],
            "medical_condition": doc["medical_condition"],
        })

    for doc in records:
        facts = [f"{doc['drug_name']} treats {doc['medical_condition']}."]
        if doc["drug_classes"]:
            facts.append(f"Drug classes: {', '.join(doc['drug_classes'])}.")
        if doc["rx_otc"]:
            facts.append(f"Availability: {doc['rx_otc']}.")
        add(doc, "facts", " ".join(facts))
        se = doc.get("side_effects_structured") or {}
        if se.get("serious"):
            add(doc, "side_effects_serious",
                f"Serious side effects of {doc['drug_name']}: "
                + "; ".join(se["serious"]))
        if se.get("common"):
            add(doc, "side_effects_common",
                f"Common side effects of {doc['drug_name']}: "
                + "; ".join(se["common"]))
        if doc.get("condition_summary"):
            add(doc, "condition_overview", doc["condition_summary"])
        if doc.get("related_drugs"):
            add(doc, "related",
                f"Drugs related to {doc['drug_name']}: "
                + ", ".join(d["name"] for d in doc["related_drugs"]))
    return chunks


_DISTRACTOR_CONDITIONS = [
    "Migraine", "Asthma", "Insomnia", "Allergic Rhinitis", "Arthritis",
    "Gout", "Anxiety", "Eczema", "Bronchitis", "Osteoporosis",
]
_DISTRACTOR_CLASSES = [
    "Beta blockers", "Proton pump inhibitors", "Antihistamines",
    "Corticosteroids", "Benzodiazepines", "Statins", "Diuretics",
    "Macrolides", "Triptans", "Bisphosphonates",
]
_NAME_SYLLABLES = ["zor", "vex", "lam", "dri", "fen", "tac", "mir", "pol",
                   "qua", "ben", "sul", "tri", "nex", "cor", "val", "dex"]


def merge_records(primary: List[Dict], secondary: List[Dict]) -> List[Dict]:
    """Merge record lists, dropping ``secondary`` records whose name space
    (drug name, generic, any brand) collides with a ``primary`` record.

    Used to combine the artifact-recovered real records (etl/recover.py)
    with the synthetic fill set: a synthetic doxycycline next to the
    recovered one would give two gt answer sets for identical query
    bodies, so colliding synthetics are dropped."""
    def names(r: Dict):
        out = {r.get("drug_name", ""), r.get("generic_name", "")}
        out.update(r.get("brand_names", []) or [])
        return {n.lower() for n in out if n}

    taken = set()
    for r in primary:
        taken |= names(r)
    out = list(primary)
    dropped = 0
    for r in secondary:
        if names(r) & taken:
            dropped += 1
            continue
        out.append(r)
    if dropped:
        log.info("merge_records: dropped %d colliding secondary records",
                 dropped)
    return out


def make_distractor_records(records: List[Dict], n: int = 60,
                            seed: int = 13,
                            shadows_per_record: int = 0,
                            hard_per_record: int = 0) -> List[Dict]:
    """Deterministic decoy drug records for honest retrieval evaluation.

    Round-1's regenerated Kaggle eval scored 1.0 across the board because
    the corpus contained ONLY the records the ground-truth rules select
    from (VERDICT.md item 4). Distractors share the real records' format
    and side-effect vocabulary — so they compete lexically — but carry
    invented drug names and DISJOINT conditions/classes, so they are never
    legitimate answers and the rule-based ground truth stays complete.

    ``shadows_per_record`` adds HARD decoys (VERDICT round-2 item 6): for
    each real record, shadow records copy its side-effect lists VERBATIM
    (near-duplicate sections) under an invented drug name and a disjoint
    condition/class — a name-keyed query must then rank the real drug's
    chunk above textually near-identical impostors, so neither the system
    nor the dense control can score 1.0 structurally.

    ``hard_per_record`` adds SAME-DOMAIN shadows (VERDICT round-3 item 2:
    the disjoint-condition shadows were resolvable by condition/class
    terms alone): these copy a real record's side-effect lists, KEEP its
    condition and drug classes, and append a drug-interaction item naming
    the real drug — so the real drug's name occurs in the decoy's chunk
    text too and name-keyed queries cannot be resolved by name idf or by
    condition terms. Same-domain records are marked
    ``same_domain: True``: they truthfully claim the real condition/class,
    so condition- and class-keyed ground truth INCLUDES them
    (``build_test_queries``) — completeness is preserved while name-keyed
    queries get genuinely confusable competition.
    """
    import random

    rng = random.Random(seed)
    side_pool = []
    for r in records:
        se = r.get("side_effects_structured") or {}
        side_pool += se.get("serious", []) + se.get("common", [])
    side_pool = sorted(set(side_pool)) or ["nausea", "headache", "dizziness"]

    # distractor conditions/classes must NEVER collide with real ones —
    # a decoy claiming a real condition would be a legitimate answer to
    # condition-keyed queries, breaking ground-truth completeness
    real_conditions = {r.get("medical_condition", "").lower() for r in records}
    real_classes = {c.lower() for r in records
                    for c in r.get("drug_classes", [])}
    conditions = [c for c in _DISTRACTOR_CONDITIONS
                  if c.lower() not in real_conditions]
    classes = [c for c in _DISTRACTOR_CLASSES if c.lower() not in real_classes]

    out = []
    for hi in range(hard_per_record):
        for r in records:
            if not (r.get("medical_condition") or r.get("drug_classes")):
                continue
            name = "".join(rng.sample(_NAME_SYLLABLES, 3)).capitalize()
            se = r.get("side_effects_structured") or {}
            serious = list(se.get("serious", []))
            # the confusable hook: the REAL drug's name inside the decoy's
            # side-effect text (a realistic interaction warning), so the
            # query term matches both documents
            serious.append(f"do not combine with {r['drug_name']} or other "
                           f"{(r.get('drug_classes') or ['similar'])[0]} "
                           f"products without medical advice")
            out.append({
                "doc_id": _md5(f"hard|{r['doc_id']}|{name}|{hi}"),
                "drug_name": name,
                "generic_name": name.lower(),
                "medical_condition": r.get("medical_condition", ""),
                "drug_classes": list(r.get("drug_classes", [])),
                "brand_names": [name],
                "rx_otc": r.get("rx_otc", "Rx"),
                "pregnancy_category": r.get("pregnancy_category", ""),
                "pregnancy_category_raw": r.get("pregnancy_category_raw", ""),
                "csa": r.get("csa", "N"),
                "alcohol": r.get("alcohol", ""),
                "rating": r.get("rating"),
                "activity": r.get("activity", ""),
                "no_of_reviews": r.get("no_of_reviews", 0),
                "side_effects_structured": {
                    "serious": serious,
                    "common": list(se.get("common", []))},
                "side_effects_raw": "; ".join(
                    serious + list(se.get("common", []))),
                "condition_summary": r.get("condition_summary", ""),
                "related_drugs": [],
                "links": {},
                "distractor": True,
                "same_domain": True,
                "shadow_of": r["doc_id"],
            })
    for si in range(shadows_per_record):
        for r in records:
            name = "".join(rng.sample(_NAME_SYLLABLES, 3)).capitalize()
            cond = rng.choice(conditions)
            se = r.get("side_effects_structured") or {}
            summary = (r.get("condition_summary") or "")
            # reuse the REAL record's summary phrasing with the condition
            # swapped — lexically adjacent, semantically disjoint
            if summary and r.get("medical_condition"):
                summary = summary.replace(r["medical_condition"], cond)
            out.append({
                "doc_id": _md5(f"shadow|{r['doc_id']}|{name}|{si}"),
                "drug_name": name,
                "generic_name": name.lower(),
                "medical_condition": cond,
                "drug_classes": [rng.choice(classes)],
                "brand_names": [name],
                "rx_otc": r.get("rx_otc", "Rx"),
                "pregnancy_category": r.get("pregnancy_category", ""),
                "pregnancy_category_raw": r.get("pregnancy_category_raw", ""),
                "csa": r.get("csa", "N"),
                "alcohol": r.get("alcohol", ""),
                "rating": r.get("rating"),
                "activity": r.get("activity", ""),
                "no_of_reviews": r.get("no_of_reviews", 0),
                "side_effects_structured": {
                    "serious": list(se.get("serious", [])),
                    "common": list(se.get("common", []))},
                "side_effects_raw": r.get("side_effects_raw", ""),
                "condition_summary": summary,
                "related_drugs": [],
                "links": {},
                "distractor": True,
                "shadow_of": r["doc_id"],
            })

    for i in range(n):
        name = "".join(rng.sample(_NAME_SYLLABLES, 3)).capitalize()
        cond = rng.choice(conditions)
        se_serious = rng.sample(side_pool, min(2, len(side_pool)))
        se_common = rng.sample(side_pool, min(3, len(side_pool)))
        out.append({
            "doc_id": _md5(f"distractor|{name}|{cond}|{i}"),
            "drug_name": name,
            "generic_name": name.lower(),
            "medical_condition": cond,
            "drug_classes": [rng.choice(classes)],
            "brand_names": [name],
            "rx_otc": rng.choice(["Rx", "OTC", "Rx/OTC"]),
            "pregnancy_category": rng.choice(
                list(_PREGNANCY_CATEGORIES.values())),
            "pregnancy_category_raw": "",
            "csa": "N",
            "alcohol": "",
            "rating": round(rng.uniform(1.0, 9.9), 1),
            "activity": f"{rng.randint(5, 95)}%",
            "no_of_reviews": rng.randint(1, 500),
            "side_effects_structured": {"serious": se_serious,
                                        "common": se_common},
            "side_effects_raw": "; ".join(se_serious + se_common),
            "condition_summary": f"{cond} is a chronic condition managed "
                                 f"with {name.lower()} and lifestyle changes.",
            "related_drugs": [],
            "links": {},
            "distractor": True,
        })
    return out


#: The 8 fixed query types (reference test_queries.py:84-99), each with a
#: canonical template (the reference's phrasing, which shares the chunk
#: text's vocabulary) and a HELD-OUT paraphrase whose key content words do
#: not occur in the chunks — so half the eval stresses semantic matching
#: (VERDICT round-2 item 6).
QUERY_TEMPLATES: List[Tuple[str, ...]] = [
    # attribute-keyed types (reference test_queries.py suite: its real
    # queries ask for pregnancy-safe / OTC options per condition). Ground
    # truth is the COMPLETE set of qualifying records — retrievable from
    # the label text ("Pregnancy: No risk..." / "Prescription Type: OTC"
    # in the SAFETY/BASIC sections). condition_best_rated keeps the
    # reference's ORDERING-defined top-5 gt (rating*100 + no_of_reviews,
    # test_queries.py:119-127): with structured-query parsing the pipeline
    # ranks the retrieved condition set by the rating metadata, so the
    # type is scoreable (round-4's caveat — "no text-retrieval system can
    # read a rating ordering from relevance alone" — held only for pure
    # text retrieval and is withdrawn).
    ("condition_best_rated",
     "Among drugs used for {condition}, which are best rated by patients?",
     "Which medications have the highest user ratings for {condition}?"),
    ("pregnancy_safe_options",
     "For {condition}, which options look pregnancy-safe?",
     "Which {condition} drugs are considered safe during pregnancy?",
     "What can a pregnant patient take for {condition}?"),
    ("otc_options", "Which OTC options exist for {condition}?",
     "What can I get over the counter for {condition}?"),
    ("drug_side_effects", "What are the side effects of {drug}?",
     "Which adverse reactions can {drug} cause?"),
    ("condition_treatment", "What drugs treat {condition}?",
     "Which medications are used to manage {condition}?"),
    ("drug_safety", "Is {drug} safe during pregnancy?",
     "Can {drug} be used while pregnant?"),
    ("drug_class_info", "What class of drug is {drug}?",
     "Which drug family does {drug} belong to?"),
    ("related_drugs", "What drugs are similar to {drug}?",
     "What are alternatives to {drug}?"),
    ("condition_overview", "What is {condition}?",
     "Give an overview of {condition}."),
    ("drug_rating", "How well rated is {drug} for {condition}?",
     "How do patients score {drug} against {condition}?"),
    ("class_based_options", "Which {drug_class} drugs are available?",
     "List the medications in the {drug_class} family."),
]

_NAME_KEYED = ("drug_side_effects", "drug_safety", "drug_class_info",
               "related_drugs", "drug_rating")


def build_test_queries(
    records: List[Dict],
    top_k: int = 5,
    output_path: Optional[str] = None,
) -> List[Dict]:
    """Rule-based test queries with chunk-level AND doc-level ground truth.

    Round-2 shipped 8 queries about ONE drug — too few to detect anything
    (VERDICT round-2 item 6). Now every unique real drug NAME yields the
    name-keyed query types, every distinct condition/class yields its
    keyed types, and each query alternates canonical vs held-out
    paraphrase templates (tagged via ``template``).

    Ground-truth completeness (round-4 revision):

    * NAME-keyed ground truth covers every real record matching the name
      exactly in ``drug_name``, ``generic_name`` OR ``brand_names`` — the
      recovered corpus (etl/recover.py) holds several records of the same
      drug under different primary names (doxycycline / Doryx / Adoxa),
      and exact-drug_name-only gt would score those correct hits wrong.
    * CONDITION- and CLASS-keyed pools additionally include ``same_domain``
      decoy records (``make_distractor_records(hard_per_record=...)``) —
      those records truthfully claim the real condition/class inside this
      corpus, so retrieving them is correct; excluding them would punish a
      perfect system. Name-keyed gt ignores them (invented names).
    * Doc-level ``documents`` lists are COMPLETE (no ``top_k`` cut): when
      a condition has more than ``top_k`` legitimate records, recall@k is
      k-bounded for every system identically — headroom instead of a
      saturated 1.0 (VERDICT round-3 item 2). Chunk-level
      ``gt_chunk_ids`` keep the reference's top-k semantics.
    """
    real = [r for r in records if not r.get("distractor")]
    same_domain = [r for r in records if r.get("same_domain")]
    if not real:
        return []
    chunks = build_etl_chunks(real)
    chunks_ext = chunks + build_etl_chunks(same_domain)
    by_doc: Dict[str, List[Dict]] = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)

    def name_docs(name: str) -> List[str]:
        """Real docs matching ``name`` exactly as drug/generic/brand."""
        low = name.lower()
        return [r["doc_id"] for r in real
                if low == r["drug_name"].lower()
                or low == (r.get("generic_name") or "").lower()
                or low in {b.lower() for b in r.get("brand_names", [])}]

    def rule_gt(qtype: str, record=None, condition=None,
                drug_class=None) -> Tuple[List[str], List[str]]:
        """(gt chunk ids, gt doc ids) for one keyed query."""
        docs: List[str] = []
        if qtype == "drug_side_effects":
            pool = [c for c in chunks if c["kind"].startswith("side_effects")
                    and c["drug_name"] == record["drug_name"]]
            docs = name_docs(record["drug_name"])
        elif qtype == "condition_treatment":
            pool = [c for c in chunks_ext if c["kind"] == "facts"
                    and c["medical_condition"] == condition]
        elif qtype == "drug_safety":
            pool = [c for c in by_doc.get(record["doc_id"], [])]
            docs = name_docs(record["drug_name"])
        elif qtype == "drug_class_info":
            pool = [c for c in chunks if c["kind"] == "facts"
                    and c["drug_name"] == record["drug_name"]]
            docs = name_docs(record["drug_name"])
        elif qtype == "related_drugs":
            # semantics: the related-drugs section OF this drug's page
            pool = [c for c in chunks if c["kind"] == "related"
                    and c["drug_name"] == record["drug_name"]]
        elif qtype == "condition_overview":
            pool = [c for c in chunks_ext if c["kind"] == "condition_overview"
                    and c["medical_condition"] == condition]
        elif qtype == "drug_rating":
            pool = [c for c in by_doc.get(record["doc_id"], [])]
            docs = name_docs(record["drug_name"])
        elif qtype == "pregnancy_safe_options":
            # categories A/B = no risk shown in human/animal studies —
            # the label text says so ("Pregnancy: No risk ...")
            cand = {r["doc_id"] for r in real + same_domain
                    if r.get("medical_condition") == condition
                    and r.get("pregnancy_category_raw") in ("A", "B")}
            pool = [c for c in chunks_ext
                    if c["doc_id"] in cand and c["kind"] == "facts"]
        elif qtype == "otc_options":
            cand = {r["doc_id"] for r in real + same_domain
                    if r.get("medical_condition") == condition
                    and "OTC" in (r.get("rx_otc") or "")}
            pool = [c for c in chunks_ext
                    if c["doc_id"] in cand and c["kind"] == "facts"]
        elif qtype == "condition_best_rated":
            # ORDERING-defined gt (reference formula, test_queries.py:
            # 119-127): qualifying condition records scored by
            # rating*100 + no_of_reviews, top_k cut — unlike the other
            # types, the doc list is NOT the complete qualifying set.
            rated = [r for r in real + same_domain
                     if r.get("medical_condition") == condition
                     and r.get("rating") is not None]
            # doc_id tie-break: hard shadows copy their source record's
            # rating AND review count, so rating scores tie exactly —
            # corpus order (the reference's implicit stable-sort rule) is
            # not reconstructible at serving time, so both the gt and the
            # pipeline's _rating_sort use (score desc, doc_id asc)
            rated.sort(key=lambda r: (-(float(r["rating"]) * 100.0
                                        + float(r.get("no_of_reviews") or 0)),
                                      r["doc_id"]))
            cand_order = [r["doc_id"] for r in rated[:top_k]]
            by_id = {c["doc_id"]: c for c in chunks_ext
                     if c["kind"] == "facts"}
            pool = [by_id[d] for d in cand_order if d in by_id]
            docs = list(dict.fromkeys(cand_order))
        else:  # class_based_options
            cand = {r["doc_id"] for r in real + same_domain
                    if drug_class in r.get("drug_classes", [])}
            pool = [c for c in chunks_ext
                    if c["doc_id"] in cand and c["kind"] == "facts"]
        if not docs:
            docs = list(dict.fromkeys(c["doc_id"] for c in pool))
        pool = pool[:top_k]
        return [c["chunk_id"] for c in pool], docs

    templates = {t[0]: tuple(t[1:]) for t in QUERY_TEMPLATES}
    queries: List[Dict] = []

    def add(qtype: str, record=None, condition=None, drug_class=None,
            both_variants: bool = False) -> None:
        gt_chunks, gt_docs = rule_gt(qtype, record, condition, drug_class)
        if not gt_docs:
            return
        i = len(queries)
        n_var = len(templates[qtype])
        all_variants = tuple(
            (ti, "canonical" if ti == 0 else "paraphrase")
            for ti in range(n_var))
        variants = all_variants if both_variants \
            else (all_variants[0],) if i % 2 == 0 else (all_variants[1],)
        for ti, variant in variants:
            i = len(queries)
            body = templates[qtype][ti].format(
                drug=record["drug_name"] if record else "",
                condition=(condition if condition is not None
                           else (record or {}).get("medical_condition", "")),
                drug_class=drug_class or "")
            queries.append({
                "id": f"kaggle_{i + 1:03d}",
                "type": qtype,
                "template": variant,
                "body": body,
                "gt_chunk_ids": gt_chunks,  # faithful (reference id space)
                "documents": gt_docs,       # doc-level ids (quirk-1 fix)
            })

    seen_names = set()
    for record in real:
        if record["drug_name"].lower() in seen_names:
            continue  # one name-keyed query set per unique name
        seen_names.add(record["drug_name"].lower())
        for qtype in _NAME_KEYED:
            add(qtype, record=record)

    # Cross-name queries: ask by GENERIC name or by an ALTERNATE brand
    # while the chunks mention the primary brand (drug_name). Lexical
    # matching alone cannot answer these — they exercise the mined
    # brand↔generic mapping with index-side canonicalization
    # (RetrievalConfig.normalize_index) or the dense arm.
    side_templates = templates["drug_side_effects"]
    generics = sorted({(r.get("generic_name") or "").strip() for r in real
                       if (r.get("generic_name") or "").strip()
                       and (r.get("generic_name") or "").strip().lower()
                       != r["drug_name"].lower()})
    for generic in generics:
        if generic.lower() in seen_names:
            continue  # identical body to a name-keyed query
        seen_names.add(generic.lower())
        i = len(queries)
        queries.append({
            "id": f"kaggle_{i + 1:03d}",
            "type": "generic_name_side_effects",
            "template": "canonical" if i % 2 == 0 else "paraphrase",
            "body": side_templates[i % 2].format(drug=generic),
            "gt_chunk_ids": [],
            "documents": sorted(name_docs(generic)),
        })
    for r in real:
        alts = [b for b in r.get("brand_names", [])
                if b and b.lower() not in seen_names]
        for alt in alts[:3]:
            seen_names.add(alt.lower())
            i = len(queries)
            queries.append({
                "id": f"kaggle_{i + 1:03d}",
                "type": "brand_alias_side_effects",
                "template": "canonical" if i % 2 == 0 else "paraphrase",
                "body": side_templates[i % 2].format(drug=alt),
                "gt_chunk_ids": [],
                "documents": sorted(name_docs(alt)),
            })
    for condition in sorted({r["medical_condition"] for r in real
                             if r.get("medical_condition")}):
        add("condition_treatment", condition=condition)
        # both templates per condition: few conditions carry an overview
        # summary / qualifying attribute records, and a by-type row needs
        # n >= 10 to measure anything
        add("condition_overview", condition=condition, both_variants=True)
        add("pregnancy_safe_options", condition=condition,
            both_variants=True)
        add("otc_options", condition=condition, both_variants=True)
        add("condition_best_rated", condition=condition, both_variants=True)
    for drug_class in sorted({c for r in real
                              for c in r.get("drug_classes", [])}):
        add("class_based_options", drug_class=drug_class)

    n_para = sum(q["template"] == "paraphrase" for q in queries)
    log.info("built %d kaggle test queries (%d canonical / %d paraphrase)",
             len(queries), len(queries) - n_para, n_para)
    if output_path:
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(queries, f, ensure_ascii=False)
    return queries
