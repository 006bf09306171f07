"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip hardware is not
available in CI): JAX_PLATFORMS / XLA_FLAGS must be set before jax is
imported anywhere, hence this conftest sets them at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from domain_rag_system_tpu.preprocessing import Chunk, Document  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_doc(i: int, source: str = "pubmed", title: str = "", content: str = "") -> Document:
    return Document(
        doc_id=f"{source}_{i}",
        source=source,
        title=title or f"Title of document {i}",
        content=content or f"Content body of document {i}. It mentions aspirin and diabetes.",
        metadata={"pubmed_id": str(i)} if source == "pubmed" else {},
    )


@pytest.fixture
def toy_chunks():
    """A small deterministic chunk corpus for index tests."""
    texts = [
        "aspirin reduces fever and treats mild pain",
        "ibuprofen is a nonsteroidal anti-inflammatory drug for pain",
        "metformin is first line treatment for type 2 diabetes mellitus",
        "insulin therapy controls blood glucose in diabetes",
        "lisinopril treats hypertension and heart failure",
        "atorvastatin lowers cholesterol and cardiovascular risk",
        "amoxicillin is an antibiotic for bacterial infections",
        "omeprazole reduces stomach acid in gastroesophageal reflux disease",
        "sertraline is a selective serotonin reuptake inhibitor for depression",
        "albuterol relieves bronchospasm in asthma patients",
        "warfarin is an anticoagulant preventing blood clots",
        "gabapentin treats neuropathic pain and seizures",
    ]
    return [
        Chunk(
            chunk_id=f"doc{i}_body",
            doc_id=f"doc{i}",
            source="pubmed",
            chunk_type="abstract",
            text=t,
            metadata={"section": "abstract", "source_tag": "even" if i % 2 == 0 else "odd"},
        )
        for i, t in enumerate(texts)
    ]
