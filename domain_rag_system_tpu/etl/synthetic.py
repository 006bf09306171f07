"""Synthetic distractor chunks for production-scale benchmarking.

The recovered BioASQ corpus yields ~3.4k chunks; the reference's production
index is 91,853 chunks (``preprocessing_stats.json`` — SURVEY.md §6). These
deterministic biomedical-sounding distractors pad the index to that scale so
throughput is measured at the reference's real corpus size while quality
metrics stay meaningful (ground truth lives in the real part; distractors
only make ranking harder).
"""

from __future__ import annotations

import random
from typing import List

from domain_rag_system_tpu.preprocessing import Chunk

_TOPICS = [
    "cardiac", "renal", "hepatic", "neural", "vascular", "immune",
    "metabolic", "skeletal", "pulmonary", "dermal", "ocular", "endocrine",
]
_VERBS = ["modulates", "inhibits", "induces", "suppresses", "regulates",
          "activates", "attenuates", "mediates"]
_NOUNS = ["apoptosis", "angiogenesis", "inflammation", "fibrosis",
          "proliferation", "oxidative stress", "signal transduction",
          "gene expression", "protein folding", "ion transport"]


def synthetic_chunks(n: int, seed: int = 7) -> List[Chunk]:
    """Deterministic biomedical-sounding distractor chunks."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        words = [
            f"{rng.choice(_TOPICS)} {rng.choice(_NOUNS)} {rng.choice(_VERBS)}"
            for _ in range(rng.randint(4, 10))
        ]
        text = (f"Study {i}: " + "; ".join(words) +
                f"; compound D{i % 9973} shows {rng.choice(_NOUNS)} effects.")
        out.append(Chunk(
            chunk_id=f"syn_{i}_abstract",
            doc_id=f"syn_{i}",
            source="pubmed",
            chunk_type="abstract",
            text=text,
            metadata={"pubmed_id": f"syn{i}"},
        ))
    return out
