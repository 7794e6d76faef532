#!/usr/bin/env python
"""Benchmark: queries/sec through the real HTTP server on a hackernews-like
corpus. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

The reference benches replay HTTP workloads (workloads/hackernews.json,
cargo xtask bench, BENCHMARKS.md); with zero egress this uses a synthetic
corpus of the same shape (meilisearch_tpu/utils/synthetic.py) and the same
transport: documents land via POST /indexes/_/documents, queries via
POST /indexes/_/search from concurrent client threads. The mix exercises
typo tolerance, multi-word ranking, filters, facets and sort.

Phases:
  serial     — one client, p50 latency + serial QPS (the reference's
               search-as-you-type story)
  concurrent — BENCH_CLIENTS client threads; the server's micro-batcher
               groups eligible queries into single-execute device batches
               (engine/batcher.py + ops/arena_scorer.py), which is the
               TPU-native serving model this project exists to prove

vs_baseline: measured concurrent QPS / BASELINE_QPS. The reference cannot
be built here (no Rust toolchain in the image, zero egress), so the
baseline anchor is derived from its only published absolute number: the
"search-as-you-type < 50 ms" claim (reference README.md:53) read as the
per-core serving bound of 1000/50 = 20 queries/sec/core — documented in
BASELINE.md with the caveat that a measured binary would be better.

Alongside the HTTP phases the bench reports:
  inprocess_device_qps — perform_search_many batches directly against the
      store (no HTTP), quantifying the tunnel+HTTP tax (BASELINE.md)
  hybrid — 768-d embeddings block (reference workload
      embeddings-movies-subset-hf.json): in-process hybrid QPS at
      semanticRatio=0.5 plus IVF recall@10 vs the exact MXU oracle

Env knobs: BENCH_DOCS (1000000 — the hackernews scale the driver targets),
BENCH_SECONDS (10), BENCH_CLIENTS (64 at 1M / 32 below), BENCH_PORT (7799),
BENCH_HYBRID (1).
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_QPS = 20.0  # reference README.md:53 <50ms p50 => ~20 QPS/core


class KeepAliveClient:
    """One persistent HTTP/1.1 connection (the reference bench clients
    reuse connections too; per-request urllib connections cost a TCP
    handshake plus a fresh server thread each, which on a 1-core host
    measured as a large share of the serving budget)."""

    def __init__(self, port, timeout=600):
        import http.client
        import socket

        class _Conn(http.client.HTTPConnection):
            def connect(inner):
                super(_Conn, inner).connect()
                # request bodies flush in two sends (headers, body);
                # without TCP_NODELAY, Nagle holds the second for the
                # server's delayed ACK (~40 ms flat per request)
                inner.sock.setsockopt(
                    socket.IPPROTO_TCP, socket.TCP_NODELAY, 1
                )

        self.conn = _Conn("127.0.0.1", port, timeout=timeout)

    def request(self, method, path, payload=None):
        import http.client

        body = None if payload is None else json.dumps(payload).encode()
        headers = {"Content-Type": "application/json"}
        for attempt in (0, 1):
            try:
                self.conn.request(method, path, body=body, headers=headers)
                resp = self.conn.getresponse()
                data = resp.read()
                return json.loads(data or b"null")
            except (http.client.HTTPException, OSError):
                self.conn.close()
                if attempt:
                    raise


def http(method, port, path, payload=None, timeout=120):
    data = None if payload is None else json.dumps(payload).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=data,
        method=method,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read() or b"null")


def hybrid_block():
    """768-d embeddings bench (reference embeddings-movies-subset-hf.json
    shape): 30k docs with userProvided vectors, hybrid semanticRatio=0.5.
    Reports in-process hybrid QPS, plus IVF recall@10 against the exact
    MXU path on the same corpus (BASELINE.json config 4)."""
    import numpy as np

    from meilisearch_tpu.index.store import IndexStore
    from meilisearch_tpu.search.perform import perform_search
    from meilisearch_tpu.utils.synthetic import WORDS
    from meilisearch_tpu.vector.store import VectorSearcher

    rng = np.random.default_rng(11)
    n, dim = 30_000, 768
    # clustered vectors (IVF's hard case is structure, not noise)
    n_clusters = 64
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    vecs = centers[assign] + 0.3 * rng.standard_normal((n, dim)).astype(
        np.float32
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    store = IndexStore("movies-hybrid", primary_key="id")
    store.settings.apply_json(
        {
            "searchableAttributes": ["title", "overview"],
            "embedders": {
                "default": {"source": "userProvided", "dimensions": dim}
            },
        }
    )
    docs = []
    for i in range(n):
        words = rng.choice(WORDS, size=6).tolist()
        docs.append(
            {
                "id": i,
                "title": " ".join(words[:3]),
                "overview": " ".join(words),
                "_vectors": {"default": vecs[i].tolist()},
            }
        )
    t0 = time.perf_counter()
    for s in range(0, n, 10_000):
        store.add_documents(docs[s : s + 10_000])
    index_s = time.perf_counter() - t0

    qvecs = centers[rng.integers(0, n_clusters, size=32)] + 0.3 * (
        rng.standard_normal((32, dim)).astype(np.float32)
    )
    qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
    qwords = [" ".join(rng.choice(WORDS, size=2).tolist()) for _ in range(32)]

    def run(i):
        return perform_search(
            store,
            {
                "q": qwords[i % 32],
                "vector": qvecs[i % 32].tolist(),
                "hybrid": {"semanticRatio": 0.5, "embedder": "default"},
                "limit": 10,
            },
        )

    # compile the semantic matmul/top-k program off the measured path
    # (production warms it from the scheduler's post-ingest hook; the
    # cold compile measured 117.8 s over the tunnel in BENCH_r04)
    t0 = time.perf_counter()
    from meilisearch_tpu.vector.store import warm_vector_kernels

    warm_vector_kernels(store)
    vector_warm_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    run(0)  # warm caches / device matmul
    warm_query_s = time.perf_counter() - t0
    n_done = 0
    slowest = 0.0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 5.0:
        t1 = time.perf_counter()
        run(n_done)
        slowest = max(slowest, time.perf_counter() - t1)
        n_done += 1
    hybrid_qps = n_done / (time.perf_counter() - t0)

    # IVF recall@10 vs the exact path, same data (tests pin >= 0.9 on
    # synthetic clusters; this publishes the measured number)
    exact_vs = VectorSearcher(store, "default")  # 30k < threshold: exact
    os.environ["MEILI_TPU_IVF_THRESHOLD"] = "10000"
    store._vector_searcher_cache = {}
    try:
        ivf_vs = VectorSearcher(store, "default")
    finally:
        del os.environ["MEILI_TPU_IVF_THRESHOLD"]
        store._vector_searcher_cache = {}
    hits = 0
    trials = 32
    for i in range(trials):
        exact_ids = {d for d, _s in exact_vs.search(qvecs[i], 10)}
        ivf_ids = {d for d, _s in ivf_vs.search(qvecs[i], 10)}
        hits += len(exact_ids & ivf_ids)
    recall = hits / (trials * 10)

    return {
        "n_docs": n,
        "dim": dim,
        "semantic_ratio": 0.5,
        "hybrid_qps": round(hybrid_qps, 2),
        "ivf_recall_at_10": round(recall, 4),
        "index_s": round(index_s, 2),
        "vector_warm_s": round(vector_warm_s, 2),
        "warm_query_s": round(warm_query_s, 2),
        "slowest_query_s": round(slowest, 3),
    }


def vector_1m_block():
    """1M-vector IVF bench row (VERDICT r4 #4): QPS, recall@10 vs the
    exact scan, and index memory, at the reference's 768-d embedding
    shape. 1M vectors crosses MEILI_TPU_IVF_THRESHOLD (default 1M), so
    VectorSearcher builds k-means lists (nlist=sqrt(n)=1000) and probes
    nprobe of them per query; the exact oracle is the same corpus below
    threshold (host scan — no 3 GB device upload for a one-shot oracle)."""
    import numpy as np

    from meilisearch_tpu.index.store import IndexStore
    from meilisearch_tpu.vector.store import VectorSearcher

    rng = np.random.default_rng(7)
    n, dim = 1_000_000, 768
    n_clusters = 1024
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    vecs = np.empty((n, dim), dtype=np.float32)
    for s in range(0, n, 100_000):  # chunked: bounds peak temporaries
        e = min(s + 100_000, n)
        vecs[s:e] = centers[assign[s:e]]
        vecs[s:e] += 0.25 * rng.standard_normal((e - s, dim)).astype(np.float32)
        vecs[s:e] /= np.linalg.norm(vecs[s:e], axis=1, keepdims=True)

    store = IndexStore("vectors-1m", primary_key="id")
    store.settings.apply_json(
        {"embedders": {"default": {"source": "userProvided", "dimensions": dim}}}
    )
    store.vectors["default"] = {i: [vecs[i]] for i in range(n)}

    t0 = time.perf_counter()
    ivf = VectorSearcher(store, "default")
    build_s = time.perf_counter() - t0
    assert ivf._ivf is not None, "1M corpus must take the IVF path"
    centroids, order, offsets = ivf._ivf
    index_mb = (
        ivf.matrix.nbytes + centroids.nbytes + order.nbytes + offsets.nbytes
    ) / 1e6

    qvecs = centers[rng.integers(0, n_clusters, size=32)] + 0.25 * (
        rng.standard_normal((32, dim)).astype(np.float32)
    )
    qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)

    n_done = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 5.0:
        ivf.search(qvecs[n_done % 32], 10)
        n_done += 1
    ivf_qps = n_done / (time.perf_counter() - t0)

    exact = VectorSearcher.__new__(VectorSearcher)
    exact.store, exact.embedder = store, "default"
    exact.docids, exact.matrix, exact.norms = ivf.docids, ivf.matrix, ivf.norms
    exact.quantized, exact.dim, exact._ivf, exact._device = False, dim, None, {}
    hits = 0
    for i in range(32):
        exact_ids = {d for d, _s in exact.search(qvecs[i], 10, use_device=False)}
        ivf_ids = {d for d, _s in ivf.search(qvecs[i], 10)}
        hits += len(exact_ids & ivf_ids)

    return {
        "n_vectors": n,
        "dim": dim,
        "ivf_qps": round(ivf_qps, 2),
        "recall_at_10": round(hits / 320, 4),
        "index_memory_mb": round(index_mb, 1),
        "ivf_build_s": round(build_s, 2),
        "nlist": len(offsets) - 1,
    }


# NOTE on client model: the serving hosts here have ONE CPU core
# (measured: spawning 16 client interpreters costs 45 s and they timeshare
# the same core as the server), so separate client processes measure
# nothing better than threads. Threads + the micro-batcher's aggregation
# window (engine/batcher.py) let real device batches form; the TPU runs
# while the core handles HTTP.


def main():
    n_docs = int(os.environ.get("BENCH_DOCS", "1000000"))
    seconds = float(os.environ.get("BENCH_SECONDS", "10"))
    # enough closed-loop clients to keep two device batches in flight
    # (one draining per executor) — 32 clients can never outrun one
    # 32-slot drain, which idled the second executor in round 2
    clients = int(
        os.environ.get("BENCH_CLIENTS", "64" if n_docs >= 500_000 else "32")
    )
    port = int(os.environ.get("BENCH_PORT", "7799"))

    from http.server import ThreadingHTTPServer

    from meilisearch_tpu.api.app import App
    from meilisearch_tpu.api.server import make_handler
    from meilisearch_tpu.utils.synthetic import QUERY_SET, generate_hackernews_like

    # kick the backend probe at t0: the tunnel relay's per-backend
    # spin-up measured 300-600 s when cold (round 5) — starting it now
    # overlaps that wait with corpus gen + ingest instead of letting the
    # 60 s probe timeout silently degrade the whole run to host serving
    # (round-5 run 1: drains=0, vs_baseline 0.75, for exactly this reason)
    boot_t0 = time.perf_counter()
    from meilisearch_tpu.ops.backend_probe import backend_kind

    backend_kind(wait_s=0)

    t0 = time.perf_counter()
    docs = generate_hackernews_like(n_docs)
    gen_s = time.perf_counter() - t0

    app = App()
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(app))
    threading.Thread(target=server.serve_forever, daemon=True).start()

    http(
        "PATCH",
        port,
        "/indexes/hackernews/settings",
        {
            "searchableAttributes": ["title", "url", "author"],
            "filterableAttributes": ["author", "points", "num_comments"],
            "sortableAttributes": ["points", "created_at"],
        },
    )
    # the reference hackernews workload ships 10 x 100k chunks
    t0 = time.perf_counter()
    last = None
    for i in range(0, len(docs), 100000):
        last = http(
            "POST", port, "/indexes/hackernews/documents", docs[i : i + 100000]
        )
    deadline = time.time() + max(600, n_docs / 1000)
    while time.time() < deadline:
        if http("GET", port, f"/tasks/{last['taskUid']}")["status"] in (
            "succeeded",
            "failed",
        ):
            break
        time.sleep(0.25)
    index_s = time.perf_counter() - t0

    queries = [{"q": q, "limit": 20} for q in QUERY_SET]
    queries.append({"q": "rust", "filter": "points > 1000", "limit": 20})
    queries.append({"q": "database", "sort": ["points:desc"], "limit": 20})
    queries.append({"q": "ai", "facets": ["author"], "limit": 20})

    main_client = KeepAliveClient(port)

    def run_query(q):
        return main_client.request("POST", "/indexes/hackernews/search", q)

    # device-kernel warm-up: the per-corpus-bucket XLA compile is a
    # one-time per-machine cost (persistent cache) and must not land
    # inside the measured window — the reference's benches likewise
    # exclude build time from search timings
    t0 = time.perf_counter()
    from meilisearch_tpu.search.device_batch import (
        device_batch_enabled,
        warm_kernels,
    )

    # wait out any remaining backend spin-up BEFORE device_batch_enabled
    # caches its verdict for the process
    backend_kind(wait_s=900.0)
    boot_to_device_s = -1.0
    if device_batch_enabled():
        warm_kernels(app.scheduler.index("hackernews"), wait=True)
        boot_to_device_s = time.perf_counter() - boot_t0
    warm_s = time.perf_counter() - t0

    # warmup: host posting caches + HTTP path
    for _ in range(3):
        for q in queries:
            run_query(q)

    # device warmup: the FIRST device drain pays one-time per-generation
    # row registration (~9 s at 1M: packing every (term,class) plane at
    # corpus width) plus first-execute costs — real serving amortizes this
    # across the corpus lifetime, so it must not land inside the measured
    # window (reference benches likewise exclude build costs). Two rounds:
    # rows register in the first, the second verifies steady state.
    row_warm_s = 0.0
    if device_batch_enabled():
        try:
            from meilisearch_tpu.search.perform import perform_search_many

            _store = app.scheduler.index("hackernews")
            _batch = [dict(queries[i % len(queries)]) for i in range(32)]
            t0 = time.perf_counter()
            for _ in range(2):
                perform_search_many(_store, _batch, force_device=True)
            row_warm_s = time.perf_counter() - t0
        except Exception:
            pass

    # serial phase
    lat = []
    t0 = time.perf_counter()
    n_serial = 0
    while time.perf_counter() - t0 < seconds / 2:
        for q in queries:
            t1 = time.perf_counter()
            run_query(q)
            lat.append(time.perf_counter() - t1)
            n_serial += 1
    serial_qps = n_serial / sum(lat)
    lat.sort()
    p50_ms = lat[len(lat) // 2] * 1000

    # concurrent phase: the serving metric. Serving-attribution counters
    # reset here so the JSON can prove WHERE the concurrent window's
    # queries were served (VERDICT r4 weak #3: the round-4 artifact could
    # not attribute its own 11x regression — every query silently paid
    # device + host via the inexact-flag fallback).
    from meilisearch_tpu.search.device_batch import serving_stats

    def run_concurrent(window_s):
        stop_at = time.perf_counter() + window_s
        done = [0] * clients

        def client(ci):
            c = KeepAliveClient(port)
            i = ci
            while time.perf_counter() < stop_at:
                c.request(
                    "POST",
                    "/indexes/hackernews/search",
                    queries[i % len(queries)],
                )
                i += clients
                done[ci] += 1

        t0 = time.perf_counter()
        threads = [
            threading.Thread(target=client, args=(ci,))
            for ci in range(clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return sum(done) / (time.perf_counter() - t0)

    # ramp: identical concurrent load, untimed, so the measured window is
    # steady-state serving (the A/B controller's measurement slices and
    # the first drain's per-generation row registration land here, not in
    # the metric). The ramp is reported in the JSON — the window measures
    # a server under sustained load, which is the production regime.
    ramp_s = float(os.environ.get("BENCH_RAMP_S", "8"))
    if ramp_s > 0:
        run_concurrent(ramp_s)
    serving_stats(reset=True)
    conc_qps = run_concurrent(seconds)
    conc_serving = serving_stats(reset=True)

    # post-write warm latency (VERDICT r2 #2): a MINOR write must not
    # flush the device snapshot — queries right after an add should stay
    # warm (base-anchored arena + host delta overlay). Measure the three
    # searches following one single-document add.
    post_write_ms = []
    for i in range(3):
        main_client.request(
            "POST",
            "/indexes/hackernews/documents",
            [{
                "id": 10_000_000 + i,
                "title": "postwrite probe doc",
                "url": "https://example.com/pw",
                "author": "pwuser",
                "points": 1,
                "num_comments": 0,
                "created_at": 1600000000,
            }],
        )
        time.sleep(0.3)  # let the scheduler drain the write
        t1 = time.perf_counter()
        run_query(queries[i % len(queries)])
        post_write_ms.append((time.perf_counter() - t1) * 1000)
    post_write_ms.sort()

    # in-process device phase: perform_search_many straight against the
    # store (no HTTP, no client threads) — quantifies the HTTP+GIL tax on
    # the 1-core host (BASELINE.md documents the tunnel share separately)
    inproc_qps = 0.0
    try:
        from meilisearch_tpu.search.perform import perform_search_many

        store = app.scheduler.index("hackernews")
        batch = [dict(queries[i % len(queries)]) for i in range(32)]
        perform_search_many(store, batch, force_device=True)  # warm rows
        n_done = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < max(4.0, seconds / 2):
            perform_search_many(store, batch, force_device=True)
            n_done += len(batch)
        inproc_qps = n_done / (time.perf_counter() - t0)
    except Exception:
        pass

    hybrid = None
    if os.environ.get("BENCH_HYBRID", "1") == "1":
        try:
            hybrid = hybrid_block()
        except Exception as e:
            hybrid = {"error": repr(e)}

    vector_1m = None
    if os.environ.get("BENCH_VECTOR_1M", "1") == "1" and n_docs >= 500_000:
        try:
            vector_1m = vector_1m_block()
        except Exception as e:
            vector_1m = {"error": repr(e)}

    server.shutdown()
    app.scheduler.stop()

    qps = max(conc_qps, serial_qps)
    result = {
        "metric": "queries_per_sec_hackernews_http_%dk" % (n_docs // 1000),
        "value": round(qps, 2),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "baseline_anchor_qps": BASELINE_QPS,
        "serial_qps": round(serial_qps, 2),
        "concurrent_qps": round(conc_qps, 2),
        "clients": clients,
        "p50_ms": round(p50_ms, 2),
        "indexing_docs_per_sec": round(n_docs / index_s, 1),
        "n_docs": n_docs,
        "corpus_gen_s": round(gen_s, 2),
        "kernel_warm_s": round(warm_s, 2),
        "cold_boot_to_device_s": round(boot_to_device_s, 2),
        "inprocess_device_qps": round(inproc_qps, 2),
        "post_write_warm_ms": round(post_write_ms[len(post_write_ms) // 2], 1),
        "select_mode": os.environ.get("MEILI_TPU_SELECT", "topk2"),
        "concurrent_ramp_s": ramp_s,
        "serving": conc_serving,
    }
    if hybrid is not None:
        result["hybrid"] = hybrid
    if vector_1m is not None:
        result["vector_1m"] = vector_1m
    print(json.dumps(result))
    sys.stdout.flush()
    # skip interpreter/C++ teardown: a background kernel-warm thread mid
    # remote-compile aborts the process at exit ("exception not
    # rethrown") AFTER the result line — harmless but reads as a crash
    os._exit(0)


if __name__ == "__main__":
    main()
