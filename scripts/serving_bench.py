#!/usr/bin/env python
"""HTTP serving daemon benchmark: python front vs native epoll front.

Starts the serving stack in-process over the recovered BioASQ corpus (tuned
config) and measures each HTTP front with a GIL-ISOLATED subprocess client
(persistent http.client connections — real clients reuse connections, and
an in-process client would contend for the server's own GIL):
  * single-client request latency (p50/p90 over N sequential /query posts);
  * concurrent interactive throughput (C threads x M requests each,
    micro-batched by the server);
  * bulk throughput (one /query_batch with all 200 eval queries).

Writes results/serving_http_bench.json with one block per front.

Client mode (internal): ``serving_bench.py --client_mode --port P ...``
runs the load generator only (stdlib imports, no jax) and prints JSON.
"""

import argparse
import json
import statistics
import subprocess
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# --------------------------------------------------------------- client mode

def run_client(port: int, n_single: int, clients: int, per_client: int,
               queries: list) -> dict:
    """Load generator: persistent-connection latency + concurrency runs."""
    import http.client

    def post(conn, path, payload):
        conn.request("POST", path, body=json.dumps(payload).encode(),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        data = resp.read()
        if resp.status != 200:
            raise RuntimeError(f"{resp.status}: {data[:200]!r}")
        return json.loads(data)

    out = {}
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    # warmup (any residual compile / first-touch cost)
    post(conn, "/query", {"query": queries[0]})

    lat = []
    for q in queries[:n_single]:
        t0 = time.perf_counter()
        post(conn, "/query", {"query": q})
        lat.append((time.perf_counter() - t0) * 1000)
    lat.sort()
    out["single_client_p50_ms"] = round(statistics.median(lat), 1)
    out["single_client_p90_ms"] = round(lat[int(len(lat) * 0.9)], 1)

    errors = []

    def client(ci):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        for i in range(per_client):
            try:
                post(c, "/query",
                     {"query": queries[(ci * per_client + i) % len(queries)]})
            except Exception as exc:  # noqa: BLE001
                errors.append(str(exc))
        c.close()

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    n_req = clients * per_client - len(errors)
    out[f"clients_{clients}_qps"] = round(n_req / wall, 1)
    out["errors"] = len(errors)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        post(conn, "/query_batch", {"queries": queries})
        wall = time.perf_counter() - t0
        best = wall if best is None else min(best, wall)
    out["bulk_query_batch_qps"] = round(len(queries) / best, 1)
    out["bulk_best_wall_s"] = round(best, 3)
    conn.close()
    return out


def client_main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--client_mode", action="store_true")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--n_single", type=int, default=60)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--per_client", type=int, default=15)
    ap.add_argument("--queries_file", required=True)
    args = ap.parse_args()
    queries = json.loads(Path(args.queries_file).read_text())
    print(json.dumps(run_client(args.port, args.n_single, args.clients,
                                args.per_client, queries)))


# --------------------------------------------------------------- server side

def measure_front(front: str, pipeline, cfg, generator, info, client_args,
                  queries_file: str) -> dict:
    """Start one HTTP front over the warm pipeline, drive it from a
    subprocess client, return its stats block."""
    if front == "native":
        from domain_rag_system_tpu.native_http import NativeRagServer

        srv = NativeRagServer(pipeline, cfg, generator=generator, port=0,
                              max_wait_ms=10.0, index_info=info,
                              max_inflight=client_args.max_inflight)
    else:
        from domain_rag_system_tpu.server import RagServer

        srv = RagServer(pipeline, cfg, generator=generator, port=0,
                        max_wait_ms=10.0, index_info=info,
                        max_inflight=client_args.max_inflight)
    srv.start_background()
    try:
        stats0 = srv.frontend.stats()
        proc = subprocess.run(
            [sys.executable, __file__, "--client_mode",
             "--port", str(srv.port), "--queries_file", queries_file,
             "--n_single", str(client_args.n_single),
             "--clients", str(client_args.clients),
             "--per_client", str(client_args.per_client)],
            capture_output=True, text=True, timeout=1800)
        if proc.returncode != 0:
            raise RuntimeError(f"client failed: {proc.stderr[-2000:]}")
        block = json.loads(proc.stdout.strip().splitlines()[-1])
        stats1 = srv.frontend.stats()
        block["batches_dispatched"] = stats1["batches"] - stats0["batches"]
        block["max_batch"] = stats1["max_batch"]
        # stage attribution (VERDICT r4 item 3): which side owns the
        # residual — device+transport (encode/dispatch/retrieve/
        # window_pull) vs host framework (preprocess/finalize) vs the
        # HTTP layer (everything outside the pipeline stages)
        block["stage_timing_ms"] = {
            k: round(v["mean_s"] * 1000, 3)
            for k, v in srv.frontend.pipeline.timer.summary().items()}
        return block
    finally:
        srv.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_single", type=int, default=60)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--per_client", type=int, default=15)
    ap.add_argument("--max_inflight", type=int, default=4,
                    help="software-pipelining depth: batches dispatched "
                         "but not yet synced")
    ap.add_argument("--fronts", nargs="+", default=["python", "native"],
                    choices=["python", "native"])
    ap.add_argument("--output", default="results/serving_http_bench.json")
    args = ap.parse_args()

    from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache

    enable_compilation_cache()

    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.evaluation.runners import load_queries
    from domain_rag_system_tpu.generation import ExtractiveGenerator
    from domain_rag_system_tpu.serving import build_pipeline

    root = Path(__file__).resolve().parent.parent
    cfg = RetrievalConfig.tuned()
    pipeline, info = build_pipeline(
        cfg,
        corpus_kwargs={
            "pubmed_path": str(root / "data/recovered/BioASQ/corpus_subset.json")},
        embedding_cache_dir="data/embcache")
    queries = [q["body"] for q in load_queries(
        root / "data/recovered/BioASQ/bioasq_queries.json")]
    queries_file = "/tmp/drs_bench_queries.json"
    Path(queries_file).write_text(json.dumps(queries))

    # warm every dispatch bucket once — shared by both fronts
    from domain_rag_system_tpu.server import dispatch_buckets

    for bucket in dispatch_buckets(cfg.batch_size):
        pipeline.query_batch(["warmup query"] * bucket, **cfg.query_kwargs())

    out = {
        "description": f"HTTP serving benchmark ({info['n_chunks']}-chunk "
                       f"index, tuned config, fused in-program encode + "
                       f"dense-band BM25), python vs native epoll front",
        "client": f"GIL-isolated subprocess, persistent http.client "
                  f"connections, {args.clients} threads",
    }
    generator = ExtractiveGenerator()
    for front in args.fronts:
        out[f"{front}_front"] = measure_front(
            front, pipeline, cfg, generator, info, args, queries_file)
        print(f"{front}: {json.dumps(out[f'{front}_front'])}", flush=True)

    print(json.dumps(out, indent=1))
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    if "--client_mode" in sys.argv:
        client_main()
    else:
        main()
