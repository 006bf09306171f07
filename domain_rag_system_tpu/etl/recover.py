"""Corpus recovery from reference artifacts.

The reference repo ships its evaluation *queries* and *results* but strips the
large corpus blobs (``/root/reference/.MISSING_LARGE_BLOBS`` lists
``corpus_subset.json``, ``OpenFDA_corpus.json``, the drugs.com CSV, …), and
this environment has no network access to re-fetch them (the reference's
corpus builder scrapes the PubMed efetch API —
``data/BioASQ/corpus_builder.py:11-56``).

This module reconstructs usable corpora from what *was* shipped:

* **BioASQ** — ``bioasq_subset.json`` carries 2,543 snippets (title/abstract
  text spans) covering 1,558 of the 1,886 ground-truth PubMed docs, and
  ``results/bioasq_faiss_test_results.json`` carries the titles of every doc
  the FAISS baseline retrieved (1,522 unique). Merging both yields ~2,000 docs
  with real title/abstract text, covering ~92% of ground-truth docs. The
  reference corpus had 3,000 docs (1,886 gt + random distractor padding,
  ``data/BioASQ/subset_sampler.py:84-95``); the unrecoverable part is mostly
  distractor padding, so recall/nDCG on the recovered corpus is comparable
  but not identical — evaluation reports must state the corpus provenance.

* **OpenFDA** — result artifacts carry 300-char ``text_preview`` bodies for
  every retrieved doc; queries ship in
  ``data/OpenFDA Drug data/openfda_test_queries.json``.

* **Kaggle** — nothing textual survives; a deterministic synthetic corpus
  generator (schema-parity with ``data/kaggle_drug_data/data_extractor.py``)
  keeps the pipeline exercisable.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Dict, List, Optional

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

REFERENCE_ROOT = Path("/root/reference")


def _pmid(url: str) -> str:
    """'http://www.ncbi.nlm.nih.gov/pubmed/19140108' → '19140108'."""
    return url.rstrip("/").rsplit("/", 1)[-1]


def recover_bioasq_corpus(
    reference_root: Path = REFERENCE_ROOT,
    output_path: Optional[Path] = None,
) -> List[Dict]:
    """Rebuild the PubMed corpus (reference schema: id/title/abstract/link).

    Sources, in priority order per doc:
      title    — FAISS baseline ``retrieved_docs[].title``, else a
                 ``beginSection == 'title'`` snippet;
      abstract — concatenation of that doc's abstract-section snippets,
                 ordered by ``offsetInBeginSection``, de-duplicated.
    """
    subset_path = reference_root / "data" / "BioASQ" / "bioasq_subset.json"
    faiss_path = reference_root / "results" / "bioasq_faiss_test_results.json"

    with open(subset_path, "r", encoding="utf-8") as f:
        questions = json.load(f)["questions"]

    titles: Dict[str, str] = {}
    if faiss_path.exists():
        with open(faiss_path, "r", encoding="utf-8") as f:
            faiss_results = json.load(f)
        for q in faiss_results.values():
            for doc in q.get("retrieved_docs", []):
                if doc.get("title"):
                    titles[str(doc["pubmed_id"])] = doc["title"]

    # Collect snippets per doc.
    title_snips: Dict[str, str] = {}
    abstract_snips: Dict[str, List[tuple]] = {}
    gt_ids = set()
    for q in questions:
        for url in q.get("documents", []):
            gt_ids.add(_pmid(url))
        for s in q.get("snippets", []):
            pid = _pmid(s["document"])
            section = s.get("beginSection", "abstract")
            text = (s.get("text") or "").strip()
            if not text:
                continue
            if section == "title":
                if pid not in title_snips or len(text) > len(title_snips[pid]):
                    title_snips[pid] = text
            else:
                abstract_snips.setdefault(pid, []).append(
                    (s.get("offsetInBeginSection", 0), text)
                )

    all_ids = sorted(set(titles) | set(title_snips) | set(abstract_snips))
    corpus: List[Dict] = []
    for pid in all_ids:
        title = titles.get(pid) or title_snips.get(pid, "")
        pieces: List[str] = []
        seen = set()
        for _, text in sorted(abstract_snips.get(pid, [])):
            if text not in seen:
                seen.add(text)
                pieces.append(text)
        abstract = " ".join(pieces)
        if not title and not abstract:
            continue
        corpus.append({
            "id": pid,
            "title": title,
            "abstract": abstract,
            "link": f"http://www.ncbi.nlm.nih.gov/pubmed/{pid}",
        })

    covered = sum(1 for d in corpus if d["id"] in gt_ids)
    log.info(
        "recovered BioASQ corpus: %d docs (%d/%d ground-truth docs covered)",
        len(corpus), covered, len(gt_ids),
    )

    if output_path:
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(corpus, f, ensure_ascii=False)
        log.info("wrote %s", output_path)
    return corpus


def recover_bioasq_queries(
    reference_root: Path = REFERENCE_ROOT,
    output_path: Optional[Path] = None,
) -> List[Dict]:
    """Extract the 200-question eval set (id, body, type, gt doc ids, answers)."""
    subset_path = reference_root / "data" / "BioASQ" / "bioasq_subset.json"
    with open(subset_path, "r", encoding="utf-8") as f:
        questions = json.load(f)["questions"]
    out = [
        {
            "id": q["id"],
            "body": q["body"],
            "type": q.get("type", ""),
            "documents": [_pmid(u) for u in q.get("documents", [])],
            "ideal_answer": q.get("ideal_answer", []),
            "exact_answer": q.get("exact_answer", []),
            "snippets": [
                {"document": _pmid(s["document"]), "text": s.get("text", "")}
                for s in q.get("snippets", [])
            ],
        }
        for q in questions
    ]
    if output_path:
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(out, f, ensure_ascii=False)
        log.info("wrote %d queries to %s", len(out), output_path)
    return out


def recover_openfda_corpus(
    reference_root: Path = REFERENCE_ROOT,
    output_path: Optional[Path] = None,
) -> List[Dict]:
    """Rebuild a mini OpenFDA corpus from result-artifact previews.

    Every retrieved doc in the FAISS/RAG result files carries ``doc_id``,
    ``brand_name``, ``generic_name``, a 300-char ``text_preview`` and label
    metadata. The same doc often appears under several queries and in both
    result files with DIFFERENT preview fragments (the RAG previews are
    chunk-level); maximal recovery merges every distinct fragment per doc
    and prefixes a drug-name header synthesized from the metadata (the
    format the original extractor used, ``data_extractor.py:88-174``).
    Only docs the baselines actually surfaced are recoverable (80 of the
    original 2,976) — coverage stats are reported alongside every eval on
    this corpus (see ``openfda_coverage``).
    """
    frags: Dict[str, List[str]] = {}
    info: Dict[str, Dict] = {}
    for fname in ("openfda_faiss_test_results.json", "openfda_rag_test_results.json"):
        path = reference_root / "results" / fname
        if not path.exists():
            continue
        with open(path, "r", encoding="utf-8") as f:
            results = json.load(f)
        for q in results.values():
            for doc in q.get("retrieved_docs", []):
                did = doc.get("doc_id")
                if not did:
                    continue
                text = (doc.get("text_preview") or "").rstrip(".").rstrip()
                bucket = frags.setdefault(did, [])
                if text and text not in bucket:
                    bucket.append(text)
                meta = info.setdefault(did, {
                    "set_id": "", "brand_name": "", "generic_name": "",
                    "metadata": {}})
                for key in ("set_id", "brand_name", "generic_name"):
                    if doc.get(key) and not meta[key]:
                        meta[key] = doc[key]
                if doc.get("metadata") and not meta["metadata"]:
                    meta["metadata"] = doc["metadata"]

    corpus = []
    for did in sorted(frags):
        meta = info[did]
        header = ""
        if meta["brand_name"] or meta["generic_name"]:
            header = (f"Drug names: {meta['brand_name']} "
                      f"({meta['generic_name']})").replace("()", "").strip()
        parts = ([header] if header else []) + frags[did]
        corpus.append({
            "id": did,
            "set_id": meta["set_id"],
            "brand_name": meta["brand_name"],
            "generic_name": meta["generic_name"],
            "text": "\n".join(parts),
            "metadata": meta["metadata"],
        })
    log.info("recovered OpenFDA mini-corpus: %d docs, %d fragments",
             len(corpus), sum(len(v) for v in frags.values()))
    if output_path:
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(corpus, f, ensure_ascii=False)
        log.info("wrote %s", output_path)
    return corpus


def corpus_coverage(corpus_ids, queries, original_size: int = 0) -> Dict:
    """Ground-truth coverage of a recovered corpus + achievable ceilings.

    Evals on snippet-recovered corpora MUST carry these numbers: a gt doc
    with no recovered text is unreachable for every system, so raw recall /
    hit@k read unfairly low next to full-corpus reference numbers
    (VERDICT.md round-1 item 4).
    """
    corpus_ids = set(corpus_ids)
    per_query = []
    for q in queries:
        gts = [str(g) for g in q.get("documents", [])]
        cov = [g for g in gts if g in corpus_ids]
        per_query.append({
            "id": q.get("id", ""),
            "gt_docs": len(gts),
            "recoverable": len(cov),
        })
    n = max(len(per_query), 1)
    recalls = [p["recoverable"] / p["gt_docs"]
               for p in per_query if p["gt_docs"]]
    return {
        "corpus_docs": len(corpus_ids),
        "original_corpus_docs": original_size,
        "queries": len(per_query),
        "gt_total": sum(p["gt_docs"] for p in per_query),
        "gt_recoverable": sum(p["recoverable"] for p in per_query),
        "recall_ceiling": round(sum(recalls) / max(len(recalls), 1), 4),
        "hit_rate_ceiling": round(
            sum(1 for p in per_query if p["recoverable"]) / n, 4),
        "per_query": per_query,
    }


def recover_openfda_queries(
    reference_root: Path = REFERENCE_ROOT,
    output_path: Optional[Path] = None,
) -> List[Dict]:
    """Copy the 5 shipped OpenFDA test queries into the working data dir."""
    src = reference_root / "data" / "OpenFDA Drug data" / "openfda_test_queries.json"
    with open(src, "r", encoding="utf-8") as f:
        payload = json.load(f)
    # Shipped schema: {"questions": [{body, documents, ideal_answer}, ...]}
    queries = [
        {
            "id": f"openfda_{i + 1:03d}",
            "body": q["body"],
            "documents": q.get("documents", []),
            "ideal_answer": q.get("ideal_answer", []),
        }
        for i, q in enumerate(payload.get("questions", payload))
    ]
    if output_path:
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(queries, f, ensure_ascii=False)
    return queries


# ----------------------------------------------------------- synthetic kaggle

_SYN_DRUGS = [
    ("doxycycline", "Acne", ["Vibramycin", "Oracea"], ["Tetracyclines"]),
    ("spironolactone", "Acne", ["Aldactone"], ["Aldosterone receptor antagonists"]),
    ("minocycline", "Acne", ["Minocin"], ["Tetracyclines"]),
    ("isotretinoin", "Acne", ["Accutane"], ["Miscellaneous antineoplastics"]),
    ("clindamycin", "Acne", ["Cleocin T"], ["Lincomycin derivatives"]),
    ("ibuprofen", "Pain", ["Advil", "Motrin"], ["NSAIDs"]),
    ("naproxen", "Pain", ["Aleve"], ["NSAIDs"]),
    ("acetaminophen", "Pain", ["Tylenol"], ["Analgesics"]),
    ("tramadol", "Pain", ["Ultram"], ["Opioids"]),
    ("metformin", "Diabetes (Type 2)", ["Glucophage"], ["Biguanides"]),
    ("glipizide", "Diabetes (Type 2)", ["Glucotrol"], ["Sulfonylureas"]),
    ("sitagliptin", "Diabetes (Type 2)", ["Januvia"], ["DPP-4 inhibitors"]),
    ("lisinopril", "Hypertension", ["Zestril", "Prinivil"], ["ACE inhibitors"]),
    ("amlodipine", "Hypertension", ["Norvasc"], ["Calcium channel blockers"]),
    ("losartan", "Hypertension", ["Cozaar"], ["ARBs"]),
    ("sertraline", "Depression", ["Zoloft"], ["SSRIs"]),
    ("fluoxetine", "Depression", ["Prozac"], ["SSRIs"]),
    ("bupropion", "Depression", ["Wellbutrin"], ["Aminoketones"]),
]

_SIDE_EFFECTS = {
    "serious": ["severe allergic reaction", "liver problems", "irregular heartbeat",
                "severe dizziness", "trouble breathing"],
    "common": ["nausea", "headache", "drowsiness", "dry mouth", "upset stomach"],
}


def synthesize_kaggle_corpus(
    n: Optional[int] = None,
    output_path: Optional[Path] = None,
) -> List[Dict]:
    """Deterministic synthetic drugs.com-style records.

    Schema parity with the reference ETL output
    (``data/kaggle_drug_data/data_extractor.py:158-199``): md5 ``doc_id`` over
    ``drug_name|medical_condition``, structured side effects, pregnancy
    category, brand names. Used only to exercise the kaggle pipeline — the
    real CSV was stripped from the reference mount and cannot be re-fetched.
    """
    records: List[Dict] = []
    drugs = _SYN_DRUGS if n is None else _SYN_DRUGS[:n]
    for i, (generic, condition, brands, classes) in enumerate(drugs):
        drug_name = brands[0] if brands else generic
        doc_id = hashlib.md5(f"{drug_name}|{condition}".encode()).hexdigest()
        serious = _SIDE_EFFECTS["serious"][: (i % 4) + 1]
        common = _SIDE_EFFECTS["common"][: (i % 5) + 1]
        records.append({
            "doc_id": doc_id,
            "drug_name": drug_name,
            "generic_name": generic,
            "medical_condition": condition,
            "drug_classes": classes,
            "brand_names": brands,
            "rx_otc": "Rx" if i % 3 else "OTC",
            "pregnancy_category": "Risk cannot be ruled out",
            "pregnancy_category_raw": "C",
            "csa": "N",
            "alcohol": "X" if i % 2 else "",
            "rating": round(5.0 + (i % 5), 1),
            "activity": f"{50 + i}%",
            "no_of_reviews": 10 + i,
            "side_effects_structured": {"serious": serious, "common": common},
            "side_effects_raw": "; ".join(serious + common),
            "condition_summary": f"{condition} is a medical condition commonly "
                                 f"treated with {', '.join(classes)}.",
            "related_drugs": [{"name": g} for g, c, _, _ in _SYN_DRUGS
                              if c == condition and g != generic][:3],
            "links": {},
        })
    if output_path:
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(records, f, ensure_ascii=False)
        log.info("wrote %d synthetic kaggle records to %s", len(records), output_path)
    return records
