"""OpenFDA drug-label ETL.

Capability parity with the reference's extractor
(``data/OpenFDA Drug data/data_extractor.py:88-174``): pull a fixed set of
labeled fields from FDA drug-label dump records into one text blob whose
``Field name:`` line prefixes are exactly what the chunker's OpenFDA
section parser re-splits on (``src/preprocessing/chunker.py:143-161``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

#: (field in label record, text prefix) — prefix strings must match the
#: chunker's section regexes.
FIELD_PREFIXES = [
    ("active_ingredient", "Active ingredients"),
    ("indications_and_usage", "Indications and usage"),
    ("dosage_and_administration", "Dosage and administration"),
    ("warnings", "Warning information"),
    ("purpose", "Purpose"),
    ("pregnancy_or_breast_feeding", "Pregnancy information"),
    ("overdosage", "Overdosage"),
    ("inactive_ingredient", "Inactive ingredients"),
    ("other_safety_information", "Other safety information"),
]


def _first(value) -> str:
    if isinstance(value, list):
        return " ".join(str(v) for v in value)
    return str(value) if value else ""


def extract_label(record: Dict) -> Optional[Dict]:
    """One FDA label dump record → corpus record, or None if unusable."""
    openfda = record.get("openfda", {})
    brand = _first(openfda.get("brand_name"))
    generic = _first(openfda.get("generic_name"))
    if not brand and not generic:
        return None

    lines = [f"Drug names: {brand} ({generic})" if generic else f"Drug names: {brand}"]
    have_fields = set()
    for field, prefix in FIELD_PREFIXES:
        text = _first(record.get(field)).strip()
        if text:
            lines.append(f"{prefix}: {text}")
            have_fields.add(field)
    if len(lines) <= 1:
        return None

    return {
        "id": record.get("id", ""),
        "set_id": record.get("set_id", ""),
        "brand_name": brand,
        "generic_name": generic,
        "text": "\n".join(lines),
        "metadata": {
            "effective_time": record.get("effective_time", ""),
            "version": record.get("version", ""),
            "has_active_ingredients": "active_ingredient" in have_fields,
            "has_warnings": "warnings" in have_fields,
            "has_dosage": "dosage_and_administration" in have_fields,
            "has_indications": "indications_and_usage" in have_fields,
        },
    }


def extract_openfda_corpus(
    dump_paths: Sequence[str],
    limit: int = 3000,
    output_path: Optional[str] = None,
) -> List[Dict]:
    """FDA drug-label JSON dump files → corpus records (reference limit 3000)."""
    corpus: List[Dict] = []
    for path in dump_paths:
        with open(path, "r", encoding="utf-8") as f:
            dump = json.load(f)
        for record in dump.get("results", dump if isinstance(dump, list) else []):
            extracted = extract_label(record)
            if extracted is not None:
                corpus.append(extracted)
            if len(corpus) >= limit:
                break
        if len(corpus) >= limit:
            break
    log.info("extracted %d OpenFDA label records", len(corpus))
    if output_path:
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(corpus, f, ensure_ascii=False)
    return corpus


_NAME_SYLLABLES = ["vor", "zan", "mex", "tal", "rin", "dux", "pha", "lor",
                   "cet", "bri", "nav", "sol", "tra", "kel", "ost", "quin"]


def make_openfda_distractors(
    corpus: Sequence[Dict],
    n: int = 600,
    shadows_per_record: int = 5,
    seed: int = 11,
) -> List[Dict]:
    """Same-domain decoy labels — the kaggle shadow recipe ported to
    OpenFDA (VERDICT r4 item 6: the 80-doc eval's control sat at 0.93
    recall@5, too easy to detect improvements against).

    Two decoy kinds, both format-matched to :func:`extract_label` output:

    * **hard shadows** (``shadows_per_record`` per real doc): an invented
      product name, the REAL doc's section text verbatim (lexically
      near-duplicate), the ingredient line swapped with a donor doc's
      (the shadow truthfully "contains" the donor's ingredients — queries
      built over the combined corpus count it as correct ground truth for
      those terms, kaggle-gt-completeness semantics), and a confusable
      interaction warning naming the REAL product — so name-keyed queries
      match the decoy lexically while only the real doc is ground truth
      (gt keys on the first ``Drug names:`` line).
    * **synthetic decoys** (``n``): invented names + invented compounds
      over section sentences sampled from the real pool — in-domain
      vocabulary, disjoint ground truth.

    Distractor docs carry ``metadata.distractor`` so
    :func:`build_openfda_queries` never keys queries on them (they appear
    only as ground truth when truthful, and as ranking pressure).
    """
    import hashlib
    import random

    rng = random.Random(seed)
    corpus = list(corpus)

    def invent_name() -> str:
        return "".join(rng.sample(_NAME_SYLLABLES, 3)).capitalize()

    def ing_line(text: str) -> Optional[str]:
        for line in text.split("\n"):
            if line.lower().startswith("active ingredients:"):
                return line
        return None

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    named = [d for d in corpus
             if (d.get("brand_name") or d.get("generic_name"))]
    section_pool: List[str] = []
    for d in corpus:
        for line in d["text"].split("\n"):
            if ":" in line and not line.lower().startswith(
                    ("drug names", "active ingredients")):
                section_pool.append(line)

    out: List[Dict] = []
    for si in range(shadows_per_record):
        for i, d in enumerate(named):
            name = invent_name()
            real_name = d.get("brand_name") or d.get("generic_name")
            donor = corpus[(i + 7 * (si + 1)) % len(corpus)]
            lines = []
            for line in d["text"].split("\n"):
                low = line.lower()
                if low.startswith("drug names:"):
                    lines.append(f"Drug names: {name}")
                elif low.startswith("active ingredients:"):
                    swapped = ing_line(donor["text"])
                    lines.append(swapped or line)
                else:
                    # scrub the real product name from body text so the
                    # only real-name hit is the controlled warning below
                    lines.append(line.replace(real_name, name))
            lines.append(f"Warning information: Do not combine {name} with "
                         f"{real_name} or similar products without medical "
                         f"advice.")
            out.append({
                "id": md5(f"shadow|{d['id']}|{name}|{si}"),
                "set_id": "",
                "brand_name": name,
                "generic_name": name.lower(),
                "text": "\n".join(lines),
                "metadata": {**d.get("metadata", {}), "distractor": True,
                             "shadow_of": str(d["id"])},
            })
    for i in range(n):
        name = invent_name()
        compound = f"{invent_name().lower()}ine {invent_name().lower()}ate"
        lines = [f"Drug names: {name}",
                 f"Active ingredients: {compound} 2.5"]
        lines += rng.sample(section_pool,
                            min(rng.randint(3, 6), len(section_pool)))
        out.append({
            "id": md5(f"decoy|{name}|{i}"),
            "set_id": "",
            "brand_name": name,
            "generic_name": name.lower(),
            "text": "\n".join(lines),
            "metadata": {"distractor": True, "has_warnings": True,
                         "has_dosage": True, "has_indications": True},
        })
    log.info("built %d OpenFDA distractors (%d shadows + %d decoys)",
             len(out), len(out) - n, n)
    return out


#: Query templates per rule kind. Each kind has a "canonical" template
#: sharing the label's section vocabulary and a "paraphrase" template with
#: HELD-OUT phrasing (vocabulary absent from the label text), so the eval
#: also stresses non-lexical matching (VERDICT round-2 item 6).
QUERY_TEMPLATES = {
    "warnings": [
        ("canonical", "What are the warnings for {name}?"),
        ("paraphrase", "What safety risks and precautions come with {name}?"),
    ],
    "dosage": [
        ("canonical", "What is the dosage and administration for {name}?"),
        ("paraphrase", "How should {name} be taken and how much?"),
    ],
    "indications": [
        ("canonical", "What are the indications and usage for {name}?"),
        ("paraphrase", "What conditions is {name} meant to help with?"),
    ],
    "ingredient": [
        ("canonical", "Which products contain the active ingredient {name}?"),
        ("paraphrase", "Which medicines are formulated with {name}?"),
    ],
}

_SECTION_FLAGS = {
    "warnings": "has_warnings",
    "dosage": "has_dosage",
    "indications": "has_indications",
}


def _ingredient_terms(text: str) -> List[str]:
    """Ingredient names from an 'Active ingredients:' line — drops
    dosage/percent tokens, keeps multiword chemical names."""
    import re

    for line in text.split("\n"):
        if line.lower().startswith("active ingredients:"):
            body = line.split(":", 1)[1]
            body = re.sub(r"\(.*?\)", " ", body)
            parts = re.split(r",|;|\band\b|/", body)
            out = []
            for p in parts:
                p = re.sub(r"[\d.%]+\s*(?:mg|mcg|g|ml|vv|ww|unit[s]?)?", " ", p,
                           flags=re.IGNORECASE)
                p = re.sub(r"\b(?:usp|hcl|topical|solution|purpose[s]?)\b", " ",
                           p, flags=re.IGNORECASE)
                p = " ".join(p.split()).strip(" .-")
                if 3 <= len(p) <= 60 and not p.isdigit():
                    out.append(p)
            return out
    return []


def build_openfda_queries(
    corpus: Sequence[Dict],
    min_queries: int = 50,
    max_gt_docs: int = 8,
    output_path: Optional[str] = None,
) -> List[Dict]:
    """Rule-generated OpenFDA test queries with COMPLETE doc-level ground
    truth over the given corpus.

    The reference ships 5 hand-written OpenFDA queries
    (``results/openfda_rag_test_results.json``) — statistically meaningless
    on the 80-doc recovered fragment (VERDICT round-2 weak item 3). These
    rules scale to any corpus size:

      * name-keyed: for each doc with a brand/generic name and a given
        section, ask about that section; ground truth = EVERY doc whose
        name-line contains the same name (several products share e.g.
        ACETAMINOPHEN — all are correct answers);
      * ingredient-keyed: for each active-ingredient term appearing in
        1..max_gt_docs docs, ask which products contain it; ground truth =
        all docs whose ingredient line mentions the term.

    Half the queries use canonical (label-vocabulary) templates, half
    held-out paraphrases, tagged via ``template`` for split reporting.
    """
    corpus = list(corpus)
    lower_names: List[tuple] = []   # (doc index, display name, lower name)
    for i, d in enumerate(corpus):
        if d.get("metadata", {}).get("distractor"):
            continue  # decoys never KEY queries (they only enter gt scans)
        name = (d.get("brand_name") or d.get("generic_name") or "").strip()
        if len(name) >= 3:
            lower_names.append((i, name, name.lower()))

    def docs_with_name(lname: str) -> List[str]:
        # Substring match on the first line: the recovered 80-doc corpus
        # reuses generic product names verbatim ("topical analgesic" x9),
        # where every same-named doc IS correct ground truth. The only
        # strict-containment pair ("...menthol" ⊂ "...menthol 6 camphor 2")
        # is also semantically correct for the shorter name's query;
        # audited 2026-08-17 — re-audit if the corpus grows.
        out = []
        for d in corpus:
            first_line = d["text"].split("\n", 1)[0].lower()
            if lname in first_line:
                out.append(str(d["id"]))
        return out

    queries: List[Dict] = []
    counter = 0

    def add(kind: str, name: str, gt: List[str]) -> None:
        nonlocal counter
        if not gt or len(gt) > max_gt_docs:
            return
        variant, template = QUERY_TEMPLATES[kind][counter % 2]
        counter += 1
        queries.append({
            "id": f"openfda_gen_{counter:03d}",
            "type": kind,
            "template": variant,
            "body": template.format(name=name),
            "documents": gt,
        })

    # name-keyed section queries
    for i, name, lname in lower_names:
        meta = corpus[i].get("metadata", {})
        gt = docs_with_name(lname)
        for kind, flag in _SECTION_FLAGS.items():
            if meta.get(flag):
                add(kind, name, gt)

    # ingredient-keyed queries: the term universe comes from REAL docs
    # (decoys never key queries) but ground truth scans the whole corpus —
    # a shadow that truthfully carries a donor's ingredient line IS a
    # correct answer for that ingredient (kaggle gt-completeness
    # semantics)
    ing_docs: Dict[str, List[str]] = {}
    ing_display: Dict[str, str] = {}
    real_first = sorted(corpus, key=lambda d: bool(
        d.get("metadata", {}).get("distractor")))
    for d in real_first:
        is_distractor = d.get("metadata", {}).get("distractor", False)
        for term in _ingredient_terms(d["text"]):
            key = term.lower()
            if is_distractor and key not in ing_display:
                continue  # decoy-only compounds get no query
            ing_docs.setdefault(key, [])
            if str(d["id"]) not in ing_docs[key]:
                ing_docs[key].append(str(d["id"]))
            if not is_distractor:
                ing_display.setdefault(key, term)
    for key in sorted(ing_docs):
        if key in ing_display and 1 <= len(ing_docs[key]) <= max_gt_docs:
            add("ingredient", ing_display[key], ing_docs[key])

    if len(queries) < min_queries:
        log.warning("only %d OpenFDA queries generated (min %d) — corpus "
                    "fragment too small", len(queries), min_queries)
    log.info("built %d OpenFDA test queries (%d canonical / %d paraphrase)",
             len(queries),
             sum(q["template"] == "canonical" for q in queries),
             sum(q["template"] == "paraphrase" for q in queries))
    if output_path:
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(queries, f, ensure_ascii=False, indent=1)
    return queries
