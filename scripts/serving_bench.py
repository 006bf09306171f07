#!/usr/bin/env python
"""HTTP serving daemon benchmark (the round-2 ad-hoc measurement, scripted).

Starts the RagServer in-process over the recovered BioASQ corpus (tuned
config), then measures:
  * single-client request latency (p50/p90 over N sequential /query posts);
  * concurrent interactive throughput (C threads x M requests each,
    micro-batched by the collector);
  * bulk throughput (one /query_batch with all 200 eval queries — padded
    to the collector's dispatch buckets server-side).

Writes results/serving_http_bench.json.
"""

import argparse
import json
import statistics
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def post(port, path, payload, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_single", type=int, default=60)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--per_client", type=int, default=15)
    ap.add_argument("--output", default="results/serving_http_bench.json")
    args = ap.parse_args()

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.evaluation.runners import load_queries
    from domain_rag_system_tpu.generation import ExtractiveGenerator
    from domain_rag_system_tpu.server import RagServer
    from domain_rag_system_tpu.serving import build_pipeline

    root = Path(__file__).resolve().parent.parent
    cfg = RetrievalConfig.tuned()
    pipeline, info = build_pipeline(cfg, corpus_kwargs={
        "pubmed_path": str(root / "data/recovered/BioASQ/corpus_subset.json")})
    queries = [q["body"] for q in load_queries(
        root / "data/recovered/BioASQ/bioasq_queries.json")]

    srv = RagServer(pipeline, cfg, generator=ExtractiveGenerator(),
                    port=0, max_wait_ms=10.0, prewarm=True)
    srv.start_background()
    port = srv.port
    out = {"description": f"HTTP serving daemon benchmark (scripts/serve.py "
                          f"equivalent, {info['n_chunks']}-chunk index, "
                          f"tuned config incl. fused in-program encode + "
                          f"dense-band BM25)"}
    try:
        # warm every dispatch bucket
        post(port, "/query", {"query": queries[0]})
        post(port, "/query_batch", {"queries": queries[:cfg.batch_size]})

        # single client latency
        lat = []
        for q in queries[: args.n_single]:
            t0 = time.perf_counter()
            post(port, "/query", {"query": q})
            lat.append((time.perf_counter() - t0) * 1000)
        lat.sort()
        out["interactive"] = {
            "single_client_p50_ms": round(statistics.median(lat), 1),
            "single_client_p90_ms": round(lat[int(len(lat) * 0.9)], 1),
        }

        # concurrent clients
        stats0 = srv.frontend.stats()
        errors = []
        def client(ci):
            for i in range(args.per_client):
                try:
                    post(port, "/query",
                         {"query": queries[(ci * args.per_client + i)
                                           % len(queries)]})
                except Exception as exc:  # noqa: BLE001
                    errors.append(str(exc))
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats1 = srv.frontend.stats()
        n_req = args.clients * args.per_client - len(errors)
        out["interactive"].update({
            f"clients_{args.clients}_qps": round(n_req / wall, 1),
            "batches_dispatched": stats1["batches"] - stats0["batches"],
            "max_batch": stats1["max_batch"],
            "errors": len(errors),
        })

        # bulk
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            post(port, "/query_batch", {"queries": queries})
            wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
        out["bulk"] = {
            "query_batch_200_qps": round(len(queries) / best, 1),
            "best_wall_s": round(best, 3),
            "note": "one POST /query_batch with all 200 queries, padded "
                    "server-side to the collector's dispatch buckets",
        }
    finally:
        srv.shutdown()

    print(json.dumps(out, indent=1))
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
