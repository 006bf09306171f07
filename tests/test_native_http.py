"""Protocol-level tests for the C++ epoll HTTP front (native/drs_http.cpp).

Route-by-route behavioral parity with the Python front is covered by
parametrizing tests/test_server.py over both fronts; this module tests what
only the native front implements: HTTP/1.1 keep-alive connection reuse,
request pipelining with strict response ordering, raw-protocol error
handling, and connection teardown with requests in flight.
"""

import json
import socket

import pytest

from domain_rag_system_tpu.config import RetrievalConfig
from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, HybridIndex
from domain_rag_system_tpu.models import MedicalEmbedder
from domain_rag_system_tpu.pipeline import RetrievalPipeline
from domain_rag_system_tpu.preprocessing import Chunk


@pytest.fixture(scope="module")
def native_server():
    from domain_rag_system_tpu.native_http import (
        NativeRagServer,
        native_http_available,
    )

    if not native_http_available():
        pytest.skip("native http library unavailable")
    texts = [
        "aspirin reduces mortality after acute myocardial infarction",
        "metformin is first-line therapy for type 2 diabetes mellitus",
        "statins lower cholesterol and cardiovascular risk",
    ]
    chunks = [Chunk(chunk_id=f"c{i}", doc_id=f"d{i}", source="pubmed",
                    chunk_type="abstract", text=t, metadata={})
              for i, t in enumerate(texts)]
    hybrid = HybridIndex(dense_index=DenseIndex(MedicalEmbedder(dim=128),
                                                row_block=8),
                         bm25_index=BM25Index())
    hybrid.index_chunks(chunks)
    cfg = RetrievalConfig(top_k=2, fusion_method="weighted",
                          vector_weight=0.3, bm25_weight=0.7, batch_size=4)
    srv = NativeRagServer(RetrievalPipeline(hybrid), cfg, port=0,
                          max_wait_ms=15.0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _recv_response(f) -> tuple:
    """Read one HTTP response off a buffered socket reader (sock.makefile)
    → (status, body). A buffered reader consumes back-to-back pipelined
    responses one at a time without losing the surplus bytes."""
    status_line = f.readline()
    if not status_line:
        raise ConnectionError("closed before status line")
    status = int(status_line.split(b" ", 2)[1])
    length = 0
    while True:
        line = f.readline()
        if line in (b"\r\n", b""):
            break
        name, _, value = line.partition(b":")
        if name.lower() == b"content-length":
            length = int(value.strip())
    rest = f.read(length)
    assert len(rest) == length, "body truncated"
    return status, json.loads(rest) if rest else {}


def _request_bytes(path: str, payload=None, extra_headers="") -> bytes:
    body = json.dumps(payload).encode() if payload is not None else b""
    method = "POST" if payload is not None else "GET"
    return (f"{method} {path} HTTP/1.1\r\nHost: t\r\n"
            f"Content-Length: {len(body)}\r\n{extra_headers}\r\n"
            ).encode() + body


def test_keepalive_connection_reuse(native_server):
    """Many requests ride ONE TCP connection (the throughput win the
    python front's HTTP/1.0-per-request model gives away)."""
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        for i in range(5):
            s.sendall(_request_bytes("/query", {"query": "diabetes"}))
            status, body = _recv_response(f)
            assert status == 200
            assert body["num_results"] == 2
        s.sendall(_request_bytes("/healthz"))
        status, body = _recv_response(f)
        assert status == 200 and body["status"] == "ok"
        assert body["index"]["http_front"] == "native-epoll"


def test_pipelined_requests_answered_in_order(native_server):
    """Multiple requests sent before reading any response come back in
    request order (HTTP/1.1 pipelining contract) — even though the server
    dispatches /query via the batcher and /healthz inline."""
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(_request_bytes("/query", {"query": "myocardial infarction"})
                  + _request_bytes("/healthz")
                  + _request_bytes("/query", {"query": "cholesterol"}))
        status1, body1 = _recv_response(f)
        status2, body2 = _recv_response(f)
        status3, body3 = _recv_response(f)
    assert (status1, status2, status3) == (200, 200, 200)
    assert body1["results"][0]["chunk_id"] == "c0"   # infarction → aspirin
    assert body2["status"] == "ok"                   # healthz in slot 2
    assert body3["results"][0]["chunk_id"] == "c2"   # cholesterol → statins


def test_pipelined_queries_share_one_dispatch(native_server):
    """Same-knob pipelined queries coalesce into one fused dispatch."""
    before = native_server.frontend.stats()
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(b"".join(_request_bytes("/query", {"query": q})
                           for q in ("aspirin", "metformin", "statin")))
        for _ in range(3):
            status, _ = _recv_response(f)
            assert status == 200
    after = native_server.frontend.stats()
    assert after["requests"] - before["requests"] == 3
    assert after["batches"] - before["batches"] == 1


def test_malformed_request_line_rejected(native_server):
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(b"GARBAGE\r\n\r\n")
        status, body = _recv_response(f)
        assert status == 400
        assert "error" in body
        # server closes the connection after a protocol error
        assert s.recv(1024) == b""


def test_chunked_transfer_encoding_rejected(native_server):
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(b"POST /query HTTP/1.1\r\nHost: t\r\n"
                  b"Transfer-Encoding: chunked\r\n\r\n")
        status, _ = _recv_response(f)
        assert status == 501


def test_oversized_body_rejected(native_server):
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(b"POST /query HTTP/1.1\r\nHost: t\r\n"
                  b"Content-Length: 999999999999\r\n\r\n")
        status, _ = _recv_response(f)
        assert status == 413


def test_connection_close_header_honoured(native_server):
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(_request_bytes("/healthz",
                                 extra_headers="Connection: close\r\n"))
        status, _ = _recv_response(f)
        assert status == 200
        assert s.recv(1024) == b""  # server closed after responding


def test_client_disconnect_while_pending_is_safe(native_server):
    """A client that vanishes mid-request must not wedge the dispatcher:
    subsequent clients are still served."""
    s = socket.create_connection(("127.0.0.1", native_server.port))
    s.sendall(_request_bytes("/query", {"query": "aspirin"}))
    s.close()  # gone before the batch window closes
    with socket.create_connection(("127.0.0.1", native_server.port)) as s2:
        f2 = s2.makefile("rb")
        s2.sendall(_request_bytes("/query", {"query": "metformin"}))
        status, body = _recv_response(f2)
        assert status == 200
        assert body["results"][0]["chunk_id"] == "c1"


def test_http10_client_gets_close_semantics(native_server):
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        body = json.dumps({"query": "aspirin"}).encode()
        s.sendall(b"POST /query HTTP/1.0\r\nHost: t\r\nContent-Length: "
                  + str(len(body)).encode() + b"\r\n\r\n" + body)
        status, out = _recv_response(f)
        assert status == 200 and out["num_results"] == 2
        assert s.recv(1024) == b""  # HTTP/1.0 → connection closed


def test_parser_fuzz_random_bytes_never_wedge(native_server):
    """Deterministic fuzz: random byte soup, truncated requests, huge
    request lines, binary garbage — the server must reject or ignore
    every one and keep serving well-formed clients afterwards."""
    import random

    rng = random.Random(0)
    payloads = []
    for _ in range(12):
        n = rng.randint(1, 2000)
        payloads.append(bytes(rng.randrange(256) for _ in range(n)))
    payloads += [
        b"\r\n\r\n",
        b"GET\r\n\r\n",
        b"GET / HTTP/1.1\r\n" + b"X: y\r\n" * 500 + b"\r\n",
        b"POST /query HTTP/1.1\r\nContent-Length: -5\r\n\r\n",
        b"POST /query HTTP/1.1\r\nContent-Length: ten\r\n\r\n",
        b"A" * 70000,                      # oversized request line
        b"POST /query HTTP/1.1\r\nContent-Length: 10\r\n\r\nshort",  # truncated
    ]
    for p in payloads:
        with socket.create_connection(
                ("127.0.0.1", native_server.port)) as s:
            # incomplete requests legitimately get NO response (the parser
            # waits for more bytes) — a short timeout just moves on
            s.settimeout(0.5)
            try:
                s.sendall(p)
                s.recv(4096)  # whatever it answers (or closes) is fine
            except (ConnectionError, socket.timeout, OSError):
                pass
    # server is still alive and correct for a well-formed client
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(_request_bytes("/query", {"query": "aspirin"}))
        status, body = _recv_response(f)
        assert status == 200
        assert body["results"][0]["chunk_id"] == "c0"


def test_bytes_after_reject_are_never_executed(native_server):
    """Request smuggling guard: once the parser rejects a request, later
    bytes on that connection must be discarded, not parsed and executed."""
    before = native_server.frontend.stats()
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        # rejected request immediately followed by a well-formed query
        s.sendall(b"POST /q HTTP/1.1\r\nTransfer-Encoding: chunked\r\n\r\n"
                  + _request_bytes("/query", {"query": "aspirin"}))
        status, _ = _recv_response(f)
        assert status == 501
        # connection closes without ever answering the smuggled request
        assert f.readline() == b""
    import time
    time.sleep(0.3)  # give a (wrongly) queued request time to execute
    after = native_server.frontend.stats()
    assert after["requests"] == before["requests"]  # nothing dispatched


def test_non_post_methods_cannot_hit_post_routes(native_server):
    """PUT/DELETE against POST-only routes (incl. index mutations) must be
    rejected with 501, matching http.server's unimplemented-method reply."""
    for method, path, payload in (
            ("DELETE", "/index/delete", {"chunk_ids": ["c0"]}),
            ("PUT", "/index/add", {"chunks": []}),
            ("PATCH", "/query", {"query": "x"})):
        with socket.create_connection(
                ("127.0.0.1", native_server.port)) as s:
            f = s.makefile("rb")
            body = json.dumps(payload).encode()
            s.sendall((f"{method} {path} HTTP/1.1\r\nHost: t\r\n"
                       f"Content-Length: {len(body)}\r\n\r\n"
                       ).encode() + body)
            status, out = _recv_response(f)
            assert status == 501, (method, path)
            assert "unsupported method" in out["error"]
    # the index is untouched
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(_request_bytes("/query", {"query": "aspirin"}))
        status, body = _recv_response(f)
        assert status == 200 and body["results"][0]["chunk_id"] == "c0"


def test_non_utf8_request_line_fails_alone(native_server):
    """A non-UTF-8 path must 400 its own request without aborting the
    dispatch cycle (other batched requests still get answers)."""
    bad = socket.create_connection(("127.0.0.1", native_server.port))
    fbad = bad.makefile("rb")
    good = socket.create_connection(("127.0.0.1", native_server.port))
    fgood = good.makefile("rb")
    # send both inside one straggler window so they share a batch
    bad.sendall(b"POST /caf\xe9 HTTP/1.1\r\nHost: t\r\n"
                b"Content-Length: 2\r\n\r\n{}")
    good.sendall(_request_bytes("/query", {"query": "metformin"}))
    status_g, body_g = _recv_response(fgood)
    assert status_g == 200
    assert body_g["results"][0]["chunk_id"] == "c1"
    status_b, _ = _recv_response(fbad)
    assert status_b == 400
    bad.close()
    good.close()


def test_half_close_after_request_still_served(native_server):
    """A client that sends a request then shutdown(SHUT_WR) (EOF) must
    still receive its response — half-close is not a reject."""
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(_request_bytes("/query", {"query": "statins"}))
        s.shutdown(socket.SHUT_WR)
        status, body = _recv_response(f)
        assert status == 200
        assert body["results"][0]["chunk_id"] == "c2"


def test_pipelined_mutation_then_query_sees_the_write(native_server):
    """A client that pipelines /index/add followed by /query on one
    connection must see its own write: mutations execute inline, BEFORE
    the same cycle's batched query dispatch."""
    chunk = {"chunk_id": "c_pipe", "doc_id": "d_pipe", "source": "pubmed",
             "chunk_type": "abstract",
             "text": "warfarin anticoagulation requires INR monitoring",
             "metadata": {}}
    with socket.create_connection(("127.0.0.1", native_server.port)) as s:
        f = s.makefile("rb")
        s.sendall(_request_bytes("/index/add", {"chunks": [chunk]})
                  + _request_bytes("/query",
                                   {"query": "warfarin INR monitoring"}))
        status1, body1 = _recv_response(f)
        status2, body2 = _recv_response(f)
        assert status1 == 200 and body1["added"] == 1
        assert status2 == 200
        assert body2["results"][0]["chunk_id"] == "c_pipe"
        # clean up for other tests
        s.sendall(_request_bytes("/index/delete", {"chunk_ids": ["c_pipe"]}))
        status3, body3 = _recv_response(f)
        assert status3 == 200 and body3["deleted"] == 1
