"""BioASQ raw-data ETL: cleaner, PubMed corpus builder, subset sampler.

Capability parity with the reference's BioASQ tooling:
  * :func:`clean_bioasq` — ``data/BioASQ/data_extractor.py:7-94``: drop
    concepts/triples, normalize snippet section names, remove questions
    whose PubMed links are invalid or that end up with no documents;
  * :func:`build_pubmed_corpus` — ``data/BioASQ/corpus_builder.py:11-151``:
    fetch title+abstract per PMID from the NCBI efetch API with rate
    limiting and a repair pass for missing/empty records (network-gated —
    this environment has no egress, so the fetcher accepts an injectable
    ``fetch_fn`` and is exercised in tests with a fake);
  * :func:`sample_subset` — ``data/BioASQ/subset_sampler.py:8-95``: fixed
    seed, N questions per type, corpus padded with random distractor docs
    to a minimum size.
"""

from __future__ import annotations

import random
import re
import time
import xml.etree.ElementTree as ET
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

_PMID_URL = re.compile(r"^https?://www\.ncbi\.nlm\.nih\.gov/pubmed/(\d+)$")

#: Snippet section renames (reference data_extractor.py:14-27).
_SECTION_RENAMES = {
    "sections.0": "abstract",
    "sections.1": "abstract",
    "sections.2": "abstract",
    "title": "title",
    "abstract": "abstract",
}


def clean_bioasq(raw: Dict) -> Dict:
    """Clean a raw BioASQ training file: {"questions": [...]}.

    Drops ``concepts``/``triples``, keeps only valid-PMID document links,
    renames snippet sections, and removes questions left with no documents.
    """
    cleaned_questions = []
    dropped_docs = 0
    for q in raw.get("questions", []):
        docs = [u for u in q.get("documents", []) if _PMID_URL.match(u)]
        dropped_docs += len(q.get("documents", [])) - len(docs)
        if not docs:
            continue
        snippets = []
        for s in q.get("snippets", []):
            if not _PMID_URL.match(s.get("document", "")):
                continue
            s = dict(s)
            for key in ("beginSection", "endSection"):
                if key in s:
                    s[key] = _SECTION_RENAMES.get(s[key], s[key])
            snippets.append(s)
        cleaned_questions.append({
            "id": q.get("id"),
            "body": q.get("body"),
            "type": q.get("type"),
            "documents": docs,
            "snippets": snippets,
            "ideal_answer": q.get("ideal_answer", []),
            "exact_answer": q.get("exact_answer", []),
        })
    log.info("cleaned BioASQ: %d/%d questions kept, %d invalid doc links dropped",
             len(cleaned_questions), len(raw.get("questions", [])), dropped_docs)
    return {"questions": cleaned_questions}


def _parse_efetch_xml(xml_text: str) -> Dict[str, Dict[str, str]]:
    """NCBI efetch XML → {pmid: {title, abstract}}."""
    out: Dict[str, Dict[str, str]] = {}
    root = ET.fromstring(xml_text)
    for article in root.iter("PubmedArticle"):
        pmid_el = article.find(".//PMID")
        if pmid_el is None:
            continue
        title_el = article.find(".//ArticleTitle")
        abstract_parts = [el.text or "" for el in article.findall(".//AbstractText")]
        out[pmid_el.text] = {
            "title": "".join(title_el.itertext()) if title_el is not None else "",
            "abstract": " ".join(p for p in abstract_parts if p),
        }
    return out


def default_fetch_fn(pmids: Sequence[str]) -> Dict[str, Dict[str, str]]:
    """Fetch title/abstract from the NCBI efetch API (requires network)."""
    import urllib.parse
    import urllib.request

    url = ("https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi?"
           + urllib.parse.urlencode({
               "db": "pubmed", "id": ",".join(pmids), "retmode": "xml"}))
    with urllib.request.urlopen(url, timeout=30) as resp:
        return _parse_efetch_xml(resp.read().decode("utf-8", "replace"))


def build_pubmed_corpus(
    pmids: Sequence[str],
    fetch_fn: Optional[Callable[[Sequence[str]], Dict[str, Dict[str, str]]]] = None,
    batch_size: int = 100,
    rate_limit_s: float = 0.4,
    max_repair_rounds: int = 2,
) -> List[Dict]:
    """PMIDs → corpus records [{id, title, abstract, link}].

    Failures produce empty-record placeholders which the repair pass
    re-fetches (reference corpus_builder.py:49-56, :90-151).
    """
    fetch_fn = fetch_fn or default_fetch_fn
    records: Dict[str, Dict] = {
        pmid: {"id": pmid, "title": "", "abstract": "",
               "link": f"http://www.ncbi.nlm.nih.gov/pubmed/{pmid}"}
        for pmid in dict.fromkeys(pmids)
    }

    def fetch_round(targets: List[str]) -> None:
        for start in range(0, len(targets), batch_size):
            batch = targets[start:start + batch_size]
            try:
                fetched = fetch_fn(batch)
            except Exception as exc:
                log.warning("fetch failed for %d pmids: %s", len(batch), exc)
                fetched = {}
            for pmid, payload in fetched.items():
                if pmid in records:
                    records[pmid].update(
                        title=payload.get("title", ""),
                        abstract=payload.get("abstract", ""),
                    )
            if rate_limit_s:
                time.sleep(rate_limit_s)

    fetch_round(list(records))
    for round_idx in range(max_repair_rounds):
        missing = [p for p, r in records.items() if not r["title"] and not r["abstract"]]
        if not missing:
            break
        log.info("repair round %d: re-fetching %d empty records",
                 round_idx + 1, len(missing))
        fetch_round(missing)

    n_empty = sum(1 for r in records.values() if not r["title"] and not r["abstract"])
    log.info("built corpus: %d records (%d still empty)", len(records), n_empty)
    return list(records.values())


def sample_subset(
    cleaned: Dict,
    corpus: Sequence[Dict],
    per_type: int = 50,
    min_corpus: int = 3000,
    seed: int = 42,
) -> Tuple[Dict, List[Dict]]:
    """Sample N questions per type + a distractor-padded corpus
    (reference subset_sampler.py semantics: seed 42, 50/type, pad to 3000)."""
    rng = random.Random(seed)
    by_type: Dict[str, List[Dict]] = {}
    for q in cleaned["questions"]:
        by_type.setdefault(q.get("type", ""), []).append(q)

    selected: List[Dict] = []
    for qtype in sorted(by_type):
        pool = by_type[qtype]
        take = min(per_type, len(pool))
        selected.extend(rng.sample(pool, take))

    needed = {u.rsplit("/", 1)[-1] for q in selected for u in q["documents"]}
    by_id = {str(d["id"]): d for d in corpus}
    subset = [by_id[p] for p in sorted(needed) if p in by_id]
    extras = [d for d in corpus if str(d["id"]) not in needed]
    rng.shuffle(extras)
    while len(subset) < min_corpus and extras:
        subset.append(extras.pop())

    log.info("subset: %d questions (%s), %d corpus docs",
             len(selected),
             ", ".join(f"{t}:{len(by_type[t])}" for t in sorted(by_type)),
             len(subset))
    return {"questions": selected}, subset
