"""Corpus loaders for the three medical sources.

Functional parity with the reference's ``DataLoader``
(``src/preprocessing/data_loader.py:25-239``): per-source ID prefixes
(``pubmed_`` / ``openfda_`` / ``kaggle_``), the same metadata fields and the
Kaggle ``=== SECTION ===`` structured-content builder (``:142-239``), which the
chunker later re-splits on.

Differences from the reference (deliberate):
  * a single :meth:`DataLoader.load` entry point dispatches by declared source,
    so new corpora only need a registered reader;
  * missing files raise by default instead of being silently skipped
    (pass ``missing_ok=True`` to get the reference's skip behavior).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional

from domain_rag_system_tpu.preprocessing.documents import Document
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


def load_pubmed(filepath: Path) -> List[Document]:
    """Load a PubMed corpus JSON: list of {id, title, abstract, link}."""
    with open(filepath, "r", encoding="utf-8") as f:
        data = json.load(f)
    docs = [
        Document(
            doc_id=f"pubmed_{item['id']}",
            source="pubmed",
            title=item.get("title", ""),
            content=item.get("abstract", ""),
            metadata={"link": item.get("link", ""), "pubmed_id": item["id"]},
        )
        for item in data
    ]
    log.info("PubMed: %d docs from %s", len(docs), filepath)
    return docs


def load_openfda(filepath: Path) -> List[Document]:
    """Load an OpenFDA drug-label corpus JSON.

    Title = ``brand_name (generic_name)``; content is the ETL's single
    ``Field name:``-prefixed text blob (cf. reference ``:72-103``).
    """
    # parsed ingredient terms become STRUCTURED metadata (lowercased),
    # so ingredient-keyed queries can compile to metadata filters the
    # same way kaggle attribute queries do (preprocessing/structured.py);
    # parsed at load time so previously recovered corpora need no
    # regeneration
    from domain_rag_system_tpu.etl.openfda import _ingredient_terms

    with open(filepath, "r", encoding="utf-8") as f:
        data = json.load(f)
    docs = []
    for item in data:
        title = item.get("brand_name", "")
        if item.get("generic_name"):
            title = f"{title} ({item['generic_name']})"
        meta_src = item.get("metadata", {})
        docs.append(
            Document(
                doc_id=f"openfda_{item['id']}",
                source="openfda",
                title=title,
                content=item.get("text", ""),
                metadata={
                    "fda_id": item["id"],
                    "set_id": item.get("set_id", ""),
                    "brand_name": item.get("brand_name", ""),
                    "generic_name": item.get("generic_name", ""),
                    "active_ingredients": [
                        t.lower()
                        for t in _ingredient_terms(item.get("text", ""))],
                    "all_names": sorted({n.lower() for n in
                                         [item.get("brand_name", ""),
                                          item.get("generic_name", "")]
                                         if n}),
                    "effective_time": meta_src.get("effective_time", ""),
                    "version": meta_src.get("version", ""),
                    "has_active_ingredients": meta_src.get("has_active_ingredients", False),
                    "has_warnings": meta_src.get("has_warnings", False),
                    "has_dosage": meta_src.get("has_dosage", False),
                    "has_indications": meta_src.get("has_indications", False),
                },
            )
        )
    log.info("OpenFDA: %d docs from %s", len(docs), filepath)
    return docs


def load_kaggle(filepath: Path) -> List[Document]:
    """Load the drugs.com (Kaggle) extracted-docs JSON.

    Content is rebuilt into ``=== SECTION ===`` blocks so the chunker's
    section parser applies (cf. reference ``:105-239``).
    """
    with open(filepath, "r", encoding="utf-8") as f:
        data = json.load(f)
    docs = []
    for item in data:
        docs.append(
            Document(
                doc_id=f"kaggle_{item['doc_id']}",
                source="kaggle",
                title=f"{item['drug_name']} for {item['medical_condition']}",
                content=build_kaggle_content(item),
                metadata={
                    "drug_name": item["drug_name"],
                    "generic_name": item.get("generic_name", ""),
                    # every name this record answers to, lowercased — the
                    # structured drug-name intent matches on this (a brand
                    # alias may never occur in the section text)
                    "all_names": sorted({n.lower() for n in
                                         [item["drug_name"],
                                          item.get("generic_name", "")]
                                         + list(item.get("brand_names", []))
                                         if n}),
                    "medical_condition": item["medical_condition"],
                    "drug_classes": item.get("drug_classes", []),
                    "brand_names": item.get("brand_names", []),
                    "rx_otc": item.get("rx_otc", ""),
                    "pregnancy_category": item.get("pregnancy_category", ""),
                    "pregnancy_category_raw": item.get("pregnancy_category_raw", ""),
                    "csa": item.get("csa", ""),
                    "alcohol": item.get("alcohol", ""),
                    "rating": item.get("rating"),
                    "activity": item.get("activity"),
                    "no_of_reviews": item.get("no_of_reviews"),
                    "links": item.get("links", {}),
                    "has_side_effects": bool(item.get("side_effects_structured")),
                    "has_condition_summary": bool(item.get("condition_summary")),
                },
            )
        )
    log.info("Kaggle: %d docs from %s", len(docs), filepath)
    return docs


def build_kaggle_content(item: Dict[str, Any]) -> str:
    """Assemble the sectioned text body for one drugs.com record.

    Section layout parity with reference ``_build_kaggle_content``
    (``data_loader.py:142-239``): BASIC INFORMATION, BRAND NAMES,
    SIDE EFFECTS (numbered serious/common), SIDE EFFECTS (RAW),
    SAFETY INFORMATION, RELATED DRUGS, CONDITION INFORMATION.
    """
    sections: List[str] = []

    basic = [f"Drug Name: {item['drug_name']}"]
    generic = item.get("generic_name")
    if generic and generic != item["drug_name"]:
        basic.append(f"Generic Name: {generic}")
    basic.append(f"Medical Condition: {item['medical_condition']}")
    if item.get("drug_classes"):
        basic.append(f"Drug Classes: {', '.join(item['drug_classes'])}")
    if item.get("rx_otc"):
        basic.append(f"Prescription Type: {item['rx_otc']}")
    if item.get("rating"):
        basic.append(f"User Rating: {item['rating']}/10")
    if item.get("activity"):
        basic.append(f"Activity Score: {item['activity']}")
    if item.get("no_of_reviews"):
        basic.append(f"Number of Reviews: {int(item['no_of_reviews'])}")
    sections.append("=== BASIC INFORMATION ===\n" + "\n".join(basic))

    if item.get("brand_names"):
        sections.append("=== BRAND NAMES ===\n" + ", ".join(item["brand_names"]))

    se = item.get("side_effects_structured")
    if se:
        lines = ["=== SIDE EFFECTS ==="]
        if se.get("serious"):
            lines.append("\nSerious Side Effects:")
            lines.extend(f"  {i}. {e}" for i, e in enumerate(se["serious"], 1))
        if se.get("common"):
            lines.append("\nCommon Side Effects:")
            lines.extend(f"  {i}. {e}" for i, e in enumerate(se["common"], 1))
        sections.append("\n".join(lines))

    if item.get("side_effects_raw"):
        sections.append(f"=== SIDE EFFECTS (RAW) ===\n{item['side_effects_raw']}")

    if item.get("pregnancy_category") or item.get("alcohol") or item.get("csa"):
        lines = ["=== SAFETY INFORMATION ==="]
        if item.get("pregnancy_category"):
            preg = item["pregnancy_category"]
            if item.get("pregnancy_category_raw"):
                preg += f" (Category {item['pregnancy_category_raw']})"
            lines.append(f"Pregnancy: {preg}")
        if item.get("alcohol"):
            alcohol_map = {"X": "Avoid alcohol", "N": "No interaction"}
            lines.append(f"Alcohol Interaction: {alcohol_map.get(item['alcohol'], item['alcohol'])}")
        if item.get("csa"):
            csa_map = {"N": "Not a controlled substance"}
            lines.append(f"Controlled Substance: {csa_map.get(item['csa'], item['csa'])}")
        sections.append("\n".join(lines))

    if item.get("related_drugs"):
        names = ", ".join(d["name"] for d in item["related_drugs"])
        sections.append("=== RELATED DRUGS ===\n" + names)

    if item.get("condition_summary"):
        sections.append("=== CONDITION INFORMATION ===\n" + item["condition_summary"])

    return "\n\n".join(sections)


_READERS = {
    "pubmed": load_pubmed,
    "openfda": load_openfda,
    "kaggle": load_kaggle,
}


class DataLoader:
    """Loads the three medical corpora into a unified ``Document`` list."""

    def __init__(
        self,
        pubmed_path: Optional[str] = None,
        openfda_path: Optional[str] = None,
        kaggle_path: Optional[str] = None,
    ):
        self.paths: Dict[str, Optional[Path]] = {
            "pubmed": Path(pubmed_path) if pubmed_path else None,
            "openfda": Path(openfda_path) if openfda_path else None,
            "kaggle": Path(kaggle_path) if kaggle_path else None,
        }

    def load(self, source: str, missing_ok: bool = False) -> List[Document]:
        path = self.paths.get(source)
        if path is None or not path.exists():
            if missing_ok:
                log.warning("corpus %r missing (%s) — skipped", source, path)
                return []
            raise FileNotFoundError(f"{source} corpus not found at {path}")
        return _READERS[source](path)

    def load_all(self, missing_ok: bool = True) -> List[Document]:
        documents: List[Document] = []
        for source in _READERS:
            documents.extend(self.load(source, missing_ok=missing_ok))
        log.info("loaded %d documents total", len(documents))
        return documents

    # Per-source aliases for reference API parity.
    def load_pubmed(self) -> List[Document]:
        return self.load("pubmed")

    def load_openfda(self) -> List[Document]:
        return self.load("openfda")

    def load_kaggle(self) -> List[Document]:
        return self.load("kaggle")
