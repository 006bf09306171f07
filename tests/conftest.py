"""Test configuration.

Tests run on a TRUE 8-device virtual CPU mesh. This environment's
``sitecustomize`` (PYTHONPATH=/root/.axon_site) registers the remote-TPU
PJRT plugin in every interpreter at startup — before conftest runs — which
silently routes "CPU" tests through the single tunneled TPU chip (slow
remote compiles, cross-process deadlocks on the chip lease). The only
reliable neutralization is re-exec'ing the interpreter with the plugin's
trigger env cleared, which this conftest does exactly once.
"""

import os
import sys

_SENTINEL = "DRS_TPU_TEST_REEXEC"

if os.environ.get(_SENTINEL) != "1":
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""          # disable axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

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
