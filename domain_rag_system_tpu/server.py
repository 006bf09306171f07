"""Production HTTP serving with dynamic micro-batching.

The reference has no serving daemon — its `scripts/query.py` rebuilds the
whole stack per invocation (`scripts/query.py:31-89`). This module keeps the
pipeline warm and multiplexes concurrent HTTP clients onto the fused batch
device program: requests queue on the host, a collector thread drains up to
``batch_size`` queries (waiting at most ``max_wait_ms`` for stragglers),
runs ONE `pipeline.query_batch` dispatch, and fans results back out. A lone
client pays ~the single-query latency; concurrent clients ride the same
device program and get batched throughput (the TPU-native answer to "serve
many users" — batch onto the MXU, don't fork processes).

Endpoints (JSON in/out):
    GET  /healthz      → index + server stats (also the readiness probe)
    GET  /metrics      → Prometheus text exposition (counters + stage times)
    POST /query        → {"query": str, ...retrieval overrides} → results
    POST /query_batch  → {"queries": [str, ...]} → list of results
    POST /rag          → /query + LLM-free answer generation
    POST /index/add    → {"chunks": [chunk dicts]} live upsert
    POST /index/delete → {"chunk_ids": [...]} live tombstoning
    POST /index/save   → {"dir": path} compacted bundle snapshot

Run: ``python scripts/serve.py [--port 8080]``.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence

from domain_rag_system_tpu.config import RetrievalConfig
from domain_rag_system_tpu.pipeline import RetrievalPipeline
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

#: retrieval knobs a request may override (subset of RetrievalConfig's
#: query-time surface; anything else in the request body is rejected so
#: typos fail loudly instead of silently falling back to defaults)
_QUERY_KNOBS = frozenset((
    "top_k", "fusion_method", "vector_weight", "bm25_weight", "prf_terms",
    "prf_docs", "prf_alpha", "group_by_doc", "evidence_alpha",
    "evidence_chunks", "fetch_mult", "bm25_type_boost", "rerank_top_n",
    "filters", "structured", "structured_modes", "structured_boost_dense",
    "structured_boost_sparse", "annotate_queries", "topk_approx",
))


class PlainText(str):
    """Marker for route payloads sent verbatim as text/plain (e.g. the
    Prometheus /metrics exposition) instead of JSON-encoded."""


def dispatch_buckets(batch_size: int):
    """Allowed dispatch batch shapes: 1 and powers of two up to
    ``batch_size`` (ascending, last = batch_size). Each bucket is one XLA
    compile; padding overhead is bounded at ~2× instead of the ~6× a
    sparse {1, 8, batch_size} set allowed for mid-size batches."""
    buckets = {1, batch_size}
    b = 2
    while b < batch_size:
        buckets.add(b)
        b *= 2
    return sorted(buckets)


class _Request:
    """One in-flight query: the collector fulfils ``event`` when done."""

    __slots__ = ("query", "filters", "result", "error", "event", "enqueued")

    def __init__(self, query: str, filters: Optional[Dict]):
        self.query = query
        self.filters = filters
        self.result: Optional[Dict] = None
        self.error: Optional[str] = None
        self.event = threading.Event()
        self.enqueued = time.monotonic()


class BatchingFrontend:
    """Collects concurrent single-query requests into device-sized batches.

    Requests with identical retrieval kwargs are batched together; a
    request with different knobs forms its own batch (knobs select a
    distinct fused program — mixing them in one dispatch is impossible by
    construction). Per-request ``filters`` are NOT part of the batch key:
    they ride the same dispatch as [B, N] mask rows (a filterless request
    in a mixed batch just gets an all-ones row), which is why
    :meth:`warm_dispatch_buckets` compiles the filtered program variant
    too — ``has_qfilter`` is a static argument.
    """

    def __init__(self, pipeline: RetrievalPipeline, cfg: RetrievalConfig,
                 max_wait_ms: float = 10.0, start_collector: bool = True,
                 max_inflight: int = 4):
        self.pipeline = pipeline
        self.cfg = cfg
        self.max_wait_ms = max_wait_ms
        # software-pipelining depth: batches DISPATCHED but not yet synced
        # (device execution overlaps collection of the next batch; the
        # per-sync transport cost amortizes max_inflight×, mirroring
        # RetrievalPipeline.query_stream)
        self.max_inflight = max(int(max_inflight), 1)
        self.batch_buckets = dispatch_buckets(cfg.batch_size)
        # serializes device dispatches against live index mutations
        # (/index/add, /index/delete): a mutation mid-batch would swap the
        # index arrays out from under an in-flight fused program's inputs
        self.index_lock = threading.Lock()
        # serializes WHOLE saves against each other (the snapshot runs
        # under index_lock, but two /index/save requests writing the same
        # directory concurrently would interleave per-file writes)
        self.save_lock = threading.Lock()
        self._queue: "queue.Queue[tuple[_Request, tuple]]" = queue.Queue()
        self._stats = {"requests": 0, "batches": 0, "errors": 0,
                       "max_batch": 0}
        self._stats_lock = threading.Lock()
        self._stop = threading.Event()
        # the native HTTP front (native_http.py) batches in its own
        # dispatcher and never calls submit(); it skips the collector thread
        self._thread: Optional[threading.Thread] = None
        if start_collector:
            self._thread = threading.Thread(target=self._collector_loop,
                                            name="drs-batcher", daemon=True)
            self._thread.start()

    # ------------------------------------------------------------ client API

    def submit(self, query: str, overrides: Dict, timeout_s: float = 60.0
               ) -> Dict:
        """Block until the query is served; raises on pipeline errors."""
        unknown = set(overrides) - _QUERY_KNOBS
        if unknown:
            raise ValueError(f"unknown retrieval knobs: {sorted(unknown)}")
        kwargs = self.cfg.query_kwargs()
        filters = overrides.pop("filters", None)
        kwargs.update(overrides)
        req = _Request(query, filters)
        # dict-valued knobs (structured_modes) must hash into the batch key
        key = tuple(sorted(
            (k, json.dumps(v, sort_keys=True) if isinstance(v, (dict, list))
             else v) for k, v in kwargs.items()))
        self._queue.put((req, key, kwargs))
        if not req.event.wait(timeout_s):
            raise TimeoutError(f"query not served within {timeout_s}s")
        if req.error is not None:
            raise RuntimeError(req.error)
        assert req.result is not None
        return req.result

    def warm_dispatch_buckets(self, sample_query: str = "warmup query",
                              **kwargs) -> float:
        """Compile the fused program for EVERY dispatch bucket shape.

        The collector only ever dispatches |buckets| distinct batch shapes,
        but each previously-unseen shape compiles on first use — through a
        remote-TPU compile service that can take minutes, stalling the
        first unlucky requests (measured: 16 concurrent clients at 4 q/s
        on a cold server vs ~100 warm). Call at startup so no live request
        ever pays a compile. Returns the warmup wall time."""
        import time as _time

        kwargs = {**self.cfg.query_kwargs(), **kwargs}
        t0 = _time.monotonic()
        for bucket in self.batch_buckets:
            with self.index_lock:
                self.pipeline.query_batch([sample_query] * bucket, **kwargs)
            # the FILTERED program variant is a separate compile
            # (has_qfilter is static): without this, the first /query
            # carrying "filters" stalls every client behind a fresh XLA
            # compile under index_lock
            with self.index_lock:
                self.pipeline.query_batch(
                    [sample_query] * bucket,
                    filters=[{"source": "pubmed"}] + [None] * (bucket - 1),
                    **kwargs)
        wall = _time.monotonic() - t0
        log.info("warmed %d dispatch buckets (plus filtered variants) "
                 "in %.1fs", len(self.batch_buckets), wall)
        return wall

    def bulk_query(self, queries: Sequence[str], filters=None,
                   **kwargs) -> List[Dict]:
        """Serve an explicit query list at the collector's dispatch shapes.

        ``/query_batch`` requests arrive with arbitrary (unbounded) lengths;
        dispatching the raw length would compile a new fused program per
        previously-unseen size — a multi-second XLA compile while holding
        ``index_lock``, stalling all ``/query`` traffic. Split into
        ``batch_size`` slices and pad the tail slice to the same bucket
        shapes the collector uses, so bulk requests only ever reuse the
        |buckets| already-compiled programs.
        """
        queries = list(queries)
        per_query_filters = (list(filters) if filters is not None
                             and not isinstance(filters, dict)
                             else [filters] * len(queries))
        outs: List[Dict] = []
        step = self.cfg.batch_size
        # software-pipelined (mirrors RetrievalPipeline.query_stream):
        # dispatch up to max_inflight slices back-to-back, then finalize
        # the oldest — one device sync per in-flight window instead of per
        # slice
        from collections import deque

        inflight: "deque" = deque()

        def drain_one():
            handle, n = inflight.popleft()
            outs.extend(self.pipeline.finalize_batch(handle)[:n])

        for start in range(0, len(queries), step):
            qs = queries[start:start + step]
            fs = per_query_filters[start:start + step]
            n = len(qs)
            bucket = next(b for b in self.batch_buckets if b >= n)
            if n < bucket:
                qs = qs + [qs[0]] * (bucket - n)
                fs = fs + [None] * (bucket - n)
            with self.index_lock:
                handle = self.pipeline.dispatch_batch(
                    qs, filters=(fs if any(fs) else None), async_copy=True,
                    **kwargs)
            inflight.append((handle, n))
            if len(inflight) >= self.max_inflight:
                drain_one()
        while inflight:
            drain_one()
        return outs

    def stats(self) -> Dict:
        with self._stats_lock:
            return dict(self._stats)

    def record_batch(self, n: int, errors: int = 0) -> None:
        """Account one dispatched batch (used by external batchers —
        the native HTTP front — so /healthz stats stay comparable)."""
        with self._stats_lock:
            self._stats["requests"] += n
            self._stats["batches"] += 1
            self._stats["errors"] += errors
            self._stats["max_batch"] = max(self._stats["max_batch"], n)

    def shutdown(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # ------------------------------------------------------- collector side

    def _collector_loop(self) -> None:
        """Software-pipelined collector (same design as the native front's
        dispatcher): collect → async DISPATCH → keep collecting while the
        device works; the oldest in-flight batch is synced only when the
        pipeline is full (``max_inflight``) or the queue went quiet. The
        pre-round-5 loop blocked inside ``query_batch``'s device sync
        between collections, so the device idled during host work and vice
        versa — that serialization was most of the serving/offline gap."""
        from collections import deque

        inflight: "deque" = deque()
        while not self._stop.is_set():
            got = self._collect_batch(block_s=0.002 if inflight else 0.1,
                                      stragglers=not inflight)
            if got is not None:
                batch, kwargs = got
                handle = self._dispatch(batch, kwargs)
                if handle is not None:
                    inflight.append((handle, batch))
            while inflight and (len(inflight) >= self.max_inflight
                                or got is None):
                self._finalize(*inflight.popleft())
        while inflight:  # drain on shutdown
            self._finalize(*inflight.popleft())

    def _collect_batch(self, block_s: float, stragglers: bool):
        """One collection cycle → (batch, kwargs) or None if no request
        arrived within ``block_s``. ``stragglers=False`` skips the
        max_wait window (in-flight device work already provides the
        batching backpressure)."""
        try:
            first_req, first_key, first_kwargs = self._queue.get(
                timeout=block_s)
        except queue.Empty:
            return None
        batch = [first_req]
        deadline = time.monotonic() + (self.max_wait_ms / 1000.0
                                       if stragglers else 0.0)
        spill: List[tuple] = []
        # Drain same-knob requests until the batch fills or the straggler
        # window closes; different-knob requests are pushed back for the
        # next cycle.
        while len(batch) < self.cfg.batch_size:
            remaining = deadline - time.monotonic()
            try:
                item = self._queue.get(
                    timeout=remaining if remaining > 0 else None,
                    block=remaining > 0)
            except queue.Empty:
                break
            if item[1] == first_key:
                batch.append(item[0])
            else:
                spill.append(item)
        for item in spill:
            self._queue.put(item)
        return batch, first_kwargs

    def _dispatch(self, batch: List[_Request], kwargs: Dict):
        """Asynchronously dispatch one batch; returns the pipeline handle
        (None after failing every request on a dispatch error)."""
        filters: Optional[Sequence] = None
        if any(r.filters for r in batch):
            filters = [r.filters for r in batch]
        # Pad to a fixed bucket size: the fused program recompiles per
        # distinct batch dimension (remote compiles cost seconds), so the
        # collector only ever dispatches |buckets| distinct shapes instead
        # of one per observed batch size.
        queries = [r.query for r in batch]
        bucket = next(b for b in self.batch_buckets if b >= len(queries))
        if len(queries) < bucket:
            queries = queries + [queries[0]] * (bucket - len(queries))
            if filters is not None:
                filters = list(filters) + [None] * (bucket - len(filters))
        try:
            with self.index_lock:
                return self.pipeline.dispatch_batch(
                    queries, filters=filters, async_copy=True, **kwargs)
        except Exception as exc:  # pragma: no cover - defensive
            log.exception("dispatch of %d failed", len(batch))
            self._fail_batch(batch, exc)
            return None

    def _finalize(self, handle, batch: List[_Request]) -> None:
        """Sync + materialize one in-flight batch; fulfil its requests."""
        try:
            outs = self.pipeline.finalize_batch(handle)
            for req, out in zip(batch, outs):
                req.result = out
        except Exception as exc:  # pragma: no cover - defensive
            log.exception("batch of %d failed", len(batch))
            for req in batch:
                req.error = f"{type(exc).__name__}: {exc}"
            with self._stats_lock:
                self._stats["errors"] += len(batch)
        finally:
            with self._stats_lock:
                self._stats["requests"] += len(batch)
                self._stats["batches"] += 1
                self._stats["max_batch"] = max(self._stats["max_batch"],
                                               len(batch))
            for req in batch:
                req.event.set()

    def _fail_batch(self, batch: List[_Request], exc: Exception) -> None:
        for req in batch:
            req.error = f"{type(exc).__name__}: {exc}"
        with self._stats_lock:
            self._stats["errors"] += len(batch)
            self._stats["requests"] += len(batch)
            self._stats["batches"] += 1
        for req in batch:
            req.event.set()


def route_misc(frontend: BatchingFrontend, generator, index_info,
               method: str, path: str, body: Dict) -> tuple:
    """Serve every route EXCEPT single-query /query and /rag (whose
    batching strategy differs per HTTP front) → ``(status, payload)``.

    Shared by the Python handler (make_handler) and the native epoll front
    (native_http.py) so route behavior cannot drift between them. Raises
    the same exceptions the handlers map to HTTP codes (KeyError/ValueError/
    TypeError → 400, TimeoutError → 504).
    """
    if method == "GET":
        if path == "/healthz":
            return 200, {"status": "ok",
                         "server": frontend.stats(),
                         "stage_timing": {
                             k: round(v["mean_s"] * 1000, 3)
                             for k, v in
                             frontend.pipeline.timer.summary().items()},
                         "index": index_info or {}}
        if path == "/metrics":
            # Prometheus text exposition; the PlainText marker makes both
            # fronts send it with text/plain (version 0.0.4)
            stats = frontend.stats()
            lines = []
            for k, v in stats.items():
                lines.append(f"# TYPE drs_{k} counter"
                             if k in ("requests", "batches", "errors")
                             else f"# TYPE drs_{k} gauge")
                lines.append(f"drs_{k} {v}")
            for stage, t in frontend.pipeline.timer.summary().items():
                lines.append(f"# TYPE drs_stage_{stage}_seconds gauge")
                lines.append(f"drs_stage_{stage}_seconds {t['mean_s']:.6f}")
            n_chunks = (index_info or {}).get("n_chunks")
            if n_chunks is None:
                n_chunks = len(frontend.pipeline.index.chunks)
            lines.append("# TYPE drs_index_chunks gauge")
            lines.append(f"drs_index_chunks {n_chunks}")
            return 200, PlainText("\n".join(lines) + "\n")
        return 404, {"error": f"no route {path}"}
    if method != "POST":
        # parity with http.server, which answers 501 for any method the
        # handler doesn't implement — without this gate a PUT/DELETE would
        # fall through to the POST routes (including index mutations)
        return 501, {"error": f"unsupported method {method}"}
    if path == "/query_batch":
        queries = body.pop("queries")
        # a bare string would iterate into per-CHARACTER queries
        if (not isinstance(queries, (list, tuple))
                or not all(isinstance(q, str) for q in queries)):
            raise ValueError("'queries' must be a list of strings")
        unknown = set(body) - _QUERY_KNOBS
        if unknown:
            raise ValueError(f"unknown retrieval knobs: {sorted(unknown)}")
        kwargs = frontend.cfg.query_kwargs()
        filters = body.pop("filters", None)
        kwargs.update(body)
        outs = frontend.bulk_query(list(queries), filters=filters, **kwargs)
        return 200, {"results": outs}
    if path == "/index/add":
        from domain_rag_system_tpu.preprocessing import Chunk

        chunks = [Chunk.from_dict(c) for c in body["chunks"]]
        with frontend.index_lock:
            frontend.pipeline.index.add_chunks_incremental(chunks)
        return 200, {"added": len(chunks),
                     "n_chunks": len(frontend.pipeline.index.chunks)}
    if path == "/index/delete":
        ids = list(body["chunk_ids"])
        with frontend.index_lock:
            deleted = frontend.pipeline.index.delete_chunks(ids)
        return 200, {"deleted": deleted}
    if path == "/index/save":
        from domain_rag_system_tpu.persistence import (
            save_index,
            snapshot_index,
        )

        out_dir = body["dir"]
        # index_lock only for the cheap consistent snapshot (queries keep
        # flowing during the compressed writes); save_lock serializes whole
        # saves so concurrent requests can't interleave files in one dir
        with frontend.save_lock:
            with frontend.index_lock:
                snap = snapshot_index(frontend.pipeline.index)
            path_out = save_index(snap, out_dir)
        return 200, {"saved": str(path_out), "n_chunks": len(snap.chunks)}
    return 404, {"error": f"no route {path}"}


def make_handler(frontend: BatchingFrontend, generator=None,
                 index_info: Optional[Dict] = None):
    """Build the request-handler class bound to one frontend."""

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1: keep-alive connections (Content-Length is always sent,
        # so the protocol upgrade is safe); HTTP/1.0's one-request-per-
        # connection model costs a TCP handshake + server thread per request
        protocol_version = "HTTP/1.1"

        # serve access logs through our logger, not stderr
        def log_message(self, fmt, *args):  # noqa: N802
            log.debug("%s %s", self.address_string(), fmt % args)

        def _send(self, code: int, payload) -> None:
            if isinstance(payload, PlainText):
                ctype, body = "text/plain; version=0.0.4", payload.encode()
            else:
                ctype = "application/json"
                body = json.dumps(payload, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self) -> Dict:
            length = int(self.headers.get("Content-Length", 0))
            if length == 0:
                return {}
            return json.loads(self.rfile.read(length))

        def do_GET(self):  # noqa: N802
            try:
                self._send(*route_misc(frontend, generator, index_info,
                                       "GET", self.path, {}))
            except Exception as exc:  # pragma: no cover - defensive
                log.exception("GET %s failed", self.path)
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

        def do_POST(self):  # noqa: N802
            try:
                body = self._read_json()
                if self.path == "/query":
                    q = body.pop("query")
                    self._send(200, frontend.submit(q, body))
                elif self.path == "/rag":
                    if generator is None:
                        self._send(503, {"error": "no generator configured"})
                        return
                    q = body.pop("query")
                    qtype = body.pop("question_type", "summary")
                    out = frontend.submit(q, body)
                    gen = generator.generate(q, out["results"],
                                             question_type=qtype,
                                             structured=out.get("structured"))
                    out["answer"] = gen["answer"]
                    out["generation"] = gen.get("metadata", {})
                    self._send(200, out)
                else:
                    self._send(*route_misc(frontend, generator, index_info,
                                           "POST", self.path, body))
            except (KeyError, ValueError, TypeError) as exc:
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})
            except TimeoutError as exc:
                self._send(504, {"error": str(exc)})
            except Exception as exc:  # pragma: no cover - defensive
                log.exception("request failed")
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


class RagServer:
    """Warm pipeline + batching frontend + threaded HTTP server."""

    def __init__(self, pipeline: RetrievalPipeline, cfg: RetrievalConfig,
                 generator=None, host: str = "127.0.0.1", port: int = 8080,
                 max_wait_ms: float = 10.0, index_info: Optional[Dict] = None,
                 prewarm: bool = False, max_inflight: int = 4):
        self.frontend = BatchingFrontend(pipeline, cfg,
                                         max_wait_ms=max_wait_ms,
                                         max_inflight=max_inflight)
        if prewarm:
            # compile every dispatch-bucket shape BEFORE accepting traffic
            # (a cold bucket costs a multi-second→minute XLA compile on the
            # first unlucky request)
            self.frontend.warm_dispatch_buckets()
        handler = make_handler(self.frontend, generator=generator,
                               index_info=index_info)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]

    def serve_forever(self) -> None:
        log.info("serving on :%d (batch_size=%d, max_wait=%.0fms)",
                 self.port, self.frontend.cfg.batch_size,
                 self.frontend.max_wait_ms)
        try:
            self.httpd.serve_forever()
        finally:
            self.shutdown()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever,
                             name="drs-http", daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.frontend.shutdown()
