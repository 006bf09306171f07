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

* **Kaggle** — the reference's ground-truth chunk ids are md5 digests of
  the ETL's chunk text; inverting that id scheme over the reference's
  stored artifacts (:func:`recover_kaggle_chunk_map` /
  :func:`recover_kaggle_records`, round 4) recovers 50 REAL drugs.com
  records — enough to score the reference's own kaggle queries. A
  deterministic synthetic generator (schema-parity with
  ``data/kaggle_drug_data/data_extractor.py``) tops the corpus up to
  eval scale.
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


# ----------------------------------------------------------- kaggle recovery

_KAGGLE_KINDS = ("facts", "side_effects_serious", "side_effects_common",
                 "condition_overview", "related")


def _kaggle_artifact_chunks(reference_root: Path) -> Dict[str, str]:
    """ETL-id-space chunk previews from the qdrant/top5 artifacts.

    Returns {chunk_id: longest preview seen}. These ids are the reference
    ETL's own (``data/kaggle_drug_data/data_extractor.py:203``:
    ``md5(f"{doc_id}|{kind}|{len(text)}")``) — the id space the reference's
    ground truth lives in (SURVEY §2.3 quirk 1)."""
    previews: Dict[str, str] = {}

    def feed(cid: str, prev: str) -> None:
        if cid and len(prev or "") > len(previews.get(cid, "")):
            previews[cid] = prev

    qd_path = reference_root / "results" / "qdrant_test_results.json"
    if qd_path.exists():
        with open(qd_path, "r", encoding="utf-8") as f:
            for q in json.load(f).get("per_query", []):
                for t in q.get("topk", []):
                    feed(t.get("chunk_id", ""), t.get("preview", ""))
    top5_path = (reference_root / "data" / "kaggle_drug_data" / "processed"
                 / "test_queries_top5.json")
    if top5_path.exists():
        with open(top5_path, "r", encoding="utf-8") as f:
            payload = json.load(f)
        for lst in payload.get("answers_top5", {}).values():
            for t in lst:
                if isinstance(t, dict):
                    feed(t.get("chunk_id", ""), t.get("preview", ""))
    return previews


_FACTS_HEADER = None  # compiled lazily (module import stays regex-free)


def _parse_facts_preview(prev: str) -> Optional[Dict]:
    """Parse a whitespace-normalized ETL ``facts`` preview.

    Original text (``data_extractor.py:210-219``)::

        {drug} — {condition}\\nClasses: ...\\nBrands: ...\\nRx/OTC: ...;
        Pregnancy: {label} ({raw})\\nRating: {r} ({n} reviews)

    The artifact previews collapse newlines to spaces, so fields are
    re-split on their labels."""
    import re

    m = re.match(r"(.+?) — (.+?)(?: (?=Classes:|Brands:|Rx/OTC:)|$)", prev)
    if not m:
        return None
    out: Dict = {"drug_name": m.group(1).strip(),
                 "medical_condition": m.group(2).strip()}
    cl = re.search(r"Classes: (.*?)(?= Brands:| Rx/OTC:|$)", prev)
    if cl:
        out["drug_classes"] = [c.strip() for c in cl.group(1).split(", ")
                               if c.strip()]
    br = re.search(r"Brands: (.*?)(?= Rx/OTC:|$)", prev)
    if br:
        out["brand_names"] = [b.strip() for b in br.group(1).split(", ")
                              if b.strip()]
    rx = re.search(r"Rx/OTC: (.*?)(?=;|$)", prev)
    if rx and rx.group(1).strip() != "Unknown":
        out["rx_otc"] = rx.group(1).strip()
    pg = re.search(r"Pregnancy: \S+ \((\w|n/a)\)", prev)
    if pg and pg.group(1) != "n/a":
        out["pregnancy_category_raw"] = pg.group(1)
    rt = re.search(r"Rating: ([\d.]+) \((\d+) reviews\)", prev)
    if rt:
        out["rating"] = float(rt.group(1))
        out["no_of_reviews"] = float(rt.group(2))
    return out


def recover_kaggle_chunk_map(
    reference_root: Path = REFERENCE_ROOT,
    max_len: int = 4000,
) -> Dict[str, Dict]:
    """Invert the reference ETL's kaggle chunk ids back to (doc, kind, len).

    The id scheme is ``md5(f"{doc_id}|{kind}|{len(text)}")`` with
    ``doc_id = md5(f"{drug_name}|{medical_condition}")``
    (``data/kaggle_drug_data/data_extractor.py:161,203``). Candidate
    (drug, condition) pairs are parsed out of the artifact previews and the
    RAG-result metadata; the unknown full-text length is brute-forced over
    ``range(10, max_len)`` — ~seconds of md5 for a complete mapping. This
    recovers the EXACT id-space linkage the reference's own evaluation
    lost (its stored kaggle metrics are 0.0 because the retrieval system
    emitted different chunk ids — SURVEY §2.3 quirk 1), so the shipped
    ground-truth chunk ids become scoreable against recovered docs.
    """
    import hashlib
    import itertools
    import re

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    previews = _kaggle_artifact_chunks(reference_root)
    if not previews:
        return {}

    drugs, conds = set(), set()
    for prev in previews.values():
        m = re.match(r"(.+?) — (.+?)(?: (?=Classes:|Brands:|Rx/OTC:)|$)",
                     prev)
        if m:
            drugs.add(m.group(1).strip())
            conds.add(m.group(2).strip())
        m = re.match(r"(?:Serious|Common) side effects of ([^:]+):", prev)
        if m:
            drugs.add(m.group(1).strip())
        m = re.match(r"Related drugs to (.+?) for (.+?):", prev)
        if m:
            drugs.add(m.group(1).strip())
            conds.add(m.group(2).strip())
        m = re.match(r"(.+?) — overview:", prev)
        if m:
            conds.add(m.group(1).strip())
    rag_path = reference_root / "results" / "kaggle_rag_test_results.json"
    if rag_path.exists():
        with open(rag_path, "r", encoding="utf-8") as f:
            for q in json.load(f).get("per_query", []):
                for t in q.get("topk", []):
                    meta = t.get("metadata") or {}
                    if meta.get("drug_name"):
                        drugs.add(meta["drug_name"])
                    if meta.get("medical_condition"):
                        conds.add(meta["medical_condition"])

    targets = set(previews)
    out: Dict[str, Dict] = {}
    for drug, cond in itertools.product(sorted(drugs), sorted(conds)):
        doc_id = md5(f"{drug}|{cond}")
        for kind in _KAGGLE_KINDS:
            base = f"{doc_id}|{kind}|"
            for length in range(10, max_len):
                cid = md5(base + str(length))
                if cid in targets:
                    out[cid] = {
                        "doc_id": doc_id,
                        "drug_name": drug,
                        "medical_condition": cond,
                        "kind": kind,
                        "text_len": length,
                        "preview": previews[cid],
                    }
    unsolved = targets - set(out)
    log.info("kaggle chunk-id inversion: %d/%d artifact chunks mapped",
             len(out), len(previews))
    if unsolved:
        log.warning("unmapped kaggle chunk ids: %s", sorted(unsolved))
    return out


def recover_kaggle_records(
    reference_root: Path = REFERENCE_ROOT,
    output_path: Optional[Path] = None,
    chunk_map: Optional[Dict[str, Dict]] = None,
) -> List[Dict]:
    """Rebuild real drugs.com records from the kaggle result artifacts.

    Two sources merge (keyed by the reference doc id
    ``md5(drug_name|medical_condition)``):

    * ``results/kaggle_rag_test_results.json`` ``topk[].metadata`` — full
      record metadata (classes, brand lists, rx/otc, pregnancy, rating)
      plus the RAG system's own chunk previews (``side_effects_raw``
      fragments are real drugs.com side-effect prose);
    * the inverted ETL-space chunks (:func:`recover_kaggle_chunk_map`) —
      ``facts`` previews parsed for metadata, ``side_effects_*`` /
      ``related`` previews for structured lists.

    Records carry ``provenance: "recovered"`` and ``recovered_truncated``
    where a chunk's known full length exceeds its preview. The original
    corpus had 2,931 drugs.com rows (the CSV was stripped —
    ``/root/reference/.MISSING_LARGE_BLOBS``); only docs the reference's
    baselines surfaced are recoverable.
    """
    import re

    from domain_rag_system_tpu.etl.kaggle import split_side_effects

    if chunk_map is None:
        chunk_map = recover_kaggle_chunk_map(reference_root)

    records: Dict[str, Dict] = {}

    def rec(doc_id: str, drug: str, cond: str) -> Dict:
        return records.setdefault(doc_id, {
            "doc_id": doc_id,
            "drug_name": drug,
            "generic_name": "",
            "medical_condition": cond,
            "drug_classes": [],
            "brand_names": [],
            "rx_otc": "",
            "pregnancy_category": "",
            "pregnancy_category_raw": "",
            "csa": "",
            "alcohol": "",
            "rating": None,
            "activity": "",
            "no_of_reviews": None,
            "side_effects_structured": {"serious": [], "common": []},
            "side_effects_raw": "",
            "condition_summary": "",
            "related_drugs": [],
            "links": {},
            "provenance": "recovered",
            "recovered_truncated": False,
        })

    # ---- RAG-result metadata: the richest source -------------------------
    rag_path = reference_root / "results" / "kaggle_rag_test_results.json"
    if rag_path.exists():
        with open(rag_path, "r", encoding="utf-8") as f:
            rag = json.load(f)
        for q in rag.get("per_query", []):
            for t in q.get("topk", []):
                m = re.match(r"kaggle_([0-9a-f]{32})_(.+?)(?:_(\d+))?$",
                             t.get("chunk_id", ""))
                if not m:
                    continue
                meta = t.get("metadata") or {}
                if not meta.get("drug_name"):
                    continue
                r = rec(m.group(1), meta["drug_name"],
                        meta.get("medical_condition", ""))
                for key in ("generic_name", "rx_otc", "pregnancy_category",
                            "pregnancy_category_raw", "csa", "alcohol",
                            "activity"):
                    if meta.get(key) and not r[key]:
                        r[key] = meta[key]
                for key in ("rating", "no_of_reviews"):
                    if meta.get(key) is not None and r[key] is None:
                        r[key] = meta[key]
                for key in ("drug_classes", "brand_names"):
                    for v in meta.get(key) or []:
                        if v and v not in r[key]:
                            r[key].append(v)
                if isinstance(meta.get("links"), dict) and not r["links"]:
                    r["links"] = meta["links"]
                prev = (t.get("preview") or "").strip()
                kind = m.group(2)
                if kind == "side_effects_raw" and prev:
                    if prev not in r["side_effects_raw"]:
                        r["side_effects_raw"] = (
                            (r["side_effects_raw"] + " " + prev).strip())
                        r["recovered_truncated"] = True

    # ---- inverted ETL chunks ---------------------------------------------
    for cid, info in chunk_map.items():
        r = rec(info["doc_id"], info["drug_name"],
                info["medical_condition"])
        prev = info["preview"].strip()
        truncated = info["text_len"] > len(prev)
        kind = info["kind"]
        if kind == "facts":
            parsed = _parse_facts_preview(prev) or {}
            for key in ("rx_otc", "pregnancy_category_raw"):
                if parsed.get(key) and not r[key]:
                    r[key] = parsed[key]
            for key in ("rating", "no_of_reviews"):
                if parsed.get(key) is not None and r[key] is None:
                    r[key] = parsed[key]
            for key in ("drug_classes", "brand_names"):
                for v in parsed.get(key, []):
                    if v and v not in r[key]:
                        r[key].append(v)
        elif kind in ("side_effects_serious", "side_effects_common"):
            body = prev.split(":", 1)[-1]
            items = [i.strip(" .;-") for i in body.split(" - ")
                     if 2 < len(i.strip(" .;-")) < 80]
            slot = ("serious" if kind == "side_effects_serious"
                    else "common")
            for i in items:
                if i not in r["side_effects_structured"][slot]:
                    r["side_effects_structured"][slot].append(i)
        elif kind == "condition_overview":
            body = prev.split("overview:", 1)[-1].strip()
            if len(body) > len(r["condition_summary"]):
                r["condition_summary"] = body
        elif kind == "related":
            body = prev.split(":", 1)[-1]
            for item in body.split(" - "):
                name = item.split(" (", 1)[0].strip(" .;-")
                if (2 < len(name) < 60
                        and name not in [d["name"]
                                         for d in r["related_drugs"]]):
                    r["related_drugs"].append({"name": name})
        if truncated:
            r["recovered_truncated"] = True
        r.setdefault("etl_chunk_lengths", {})[kind] = info["text_len"]

    out = sorted(records.values(), key=lambda r: r["doc_id"])
    for r in out:
        if not r["side_effects_raw"]:
            se = r["side_effects_structured"]
            r["side_effects_raw"] = "; ".join(se["serious"] + se["common"])
        elif not (r["side_effects_structured"]["serious"]
                  or r["side_effects_structured"]["common"]):
            r["side_effects_structured"] = split_side_effects(
                r["side_effects_raw"])
        if not r["pregnancy_category"] and r["pregnancy_category_raw"]:
            from domain_rag_system_tpu.etl.kaggle import _PREGNANCY_CATEGORIES

            r["pregnancy_category"] = _PREGNANCY_CATEGORIES.get(
                r["pregnancy_category_raw"], "")
        if not r["generic_name"]:
            r["generic_name"] = r["drug_name"]
    log.info("recovered %d real kaggle records (%d with side-effect text)",
             len(out), sum(1 for r in out
                           if r["side_effects_structured"]["serious"]
                           or r["side_effects_structured"]["common"]))
    if output_path:
        output_path = Path(output_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(out, f, ensure_ascii=False, indent=1)
        log.info("wrote %s", output_path)
    return out


def recover_kaggle_queries(
    reference_root: Path = REFERENCE_ROOT,
    output_path: Optional[Path] = None,
    chunk_map: Optional[Dict[str, Dict]] = None,
) -> List[Dict]:
    """The reference's 10 real kaggle test queries, ground truth mapped.

    Ground-truth chunk ids (ETL id space) are translated to doc-level ids
    via the inverted chunk map, closing SURVEY §2.3 quirk 1 with the
    REFERENCE'S OWN queries: its stored metrics are 0.0 on every query
    because the id spaces never intersected
    (``results/kaggle_rag_test_results.json`` metrics), while the same
    queries + recovered docs score meaningfully here."""
    if chunk_map is None:
        chunk_map = recover_kaggle_chunk_map(reference_root)
    rag_path = reference_root / "results" / "kaggle_rag_test_results.json"
    if not rag_path.exists():
        return []
    with open(rag_path, "r", encoding="utf-8") as f:
        rag = json.load(f)
    queries = []
    for q in rag.get("per_query", []):
        gt_chunks = [str(g) for g in q.get("ground_truth", [])]
        gt_docs = list(dict.fromkeys(
            chunk_map[g]["doc_id"] for g in gt_chunks if g in chunk_map))
        queries.append({
            "id": f"kaggle_ref_{q.get('id', len(queries) + 1)}",
            "type": q.get("type", ""),
            "body": q.get("query", ""),
            "gt_chunk_ids": gt_chunks,
            "documents": gt_docs,
            "ideal_answer": q.get("ideal_answer", []),
            "provenance": "reference",
        })
    n_mapped = sum(1 for q in queries if q["documents"])
    log.info("recovered %d reference kaggle queries (%d with mapped gt)",
             len(queries), n_mapped)
    if output_path:
        output_path = Path(output_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(queries, f, ensure_ascii=False, indent=1)
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
