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
