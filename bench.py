#!/usr/bin/env python
"""Benchmark: queries/sec on a hackernews-like corpus.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference workload (workloads/hackernews.json) replays ~1M documents and
search commands; with zero egress we use a synthetic corpus of the same shape
(meilisearch_tpu/utils/synthetic.py). The search mix exercises typo
tolerance, multi-word ranking (words/typo/proximity/attribute/exactness),
filters, and sort — the same paths the reference benches time.

Env knobs: BENCH_DOCS (default 100000), BENCH_ROUNDS (default 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import perform_search
from meilisearch_tpu.utils.synthetic import QUERY_SET, generate_hackernews_like


def main():
    n_docs = int(os.environ.get("BENCH_DOCS", "100000"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))

    t0 = time.perf_counter()
    docs = generate_hackernews_like(n_docs)
    gen_s = time.perf_counter() - t0

    store = IndexStore("hackernews", primary_key="id")
    store.settings.apply_json(
        {
            "searchableAttributes": ["title", "url", "author"],
            "filterableAttributes": ["author", "points", "num_comments"],
            "sortableAttributes": ["points", "created_at"],
        }
    )
    t0 = time.perf_counter()
    store.add_documents(docs)
    index_s = time.perf_counter() - t0

    queries = []
    for q in QUERY_SET:
        queries.append({"q": q, "limit": 20})
    queries.append({"q": "rust", "filter": "points > 1000", "limit": 20})
    queries.append(
        {"q": "database", "sort": ["points:desc"], "limit": 20}
    )
    queries.append({"q": "ai", "facets": ["author"], "limit": 20})

    # warmup (builds caches, compiles device kernels)
    for q in queries:
        perform_search(store, dict(q))

    # optional concurrency, like the reference's workload replays
    # (BENCHMARKS.md: async HTTP command streams); numpy drops the GIL in
    # the heavy posting/DP ops so worker threads overlap on multi-core
    # hosts (default 1: the axon host exposes a single core)
    default_conc = "1" if (os.cpu_count() or 1) <= 2 else "4"
    concurrency = int(os.environ.get("BENCH_CONCURRENCY", default_conc))
    workload = [dict(q) for _ in range(rounds) for q in queries]
    n_queries = len(workload)
    t0 = time.perf_counter()
    if concurrency > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            list(pool.map(lambda q: perform_search(store, q), workload))
    else:
        for q in workload:
            perform_search(store, q)
    elapsed = time.perf_counter() - t0
    qps = n_queries / elapsed

    lat = []
    for q in queries:
        t1 = time.perf_counter()
        perform_search(store, dict(q))
        lat.append(time.perf_counter() - t1)
    lat.sort()
    p50_ms = lat[len(lat) // 2] * 1000

    # batched device execution (SURVEY §2.6): chain-compatible queries run
    # as grouped single-execute device batches; opt-in until the XLA
    # compile latency over the tunnel is amortized by a persistent cache
    batched_qps = None
    if os.environ.get("MEILI_TPU_DEVICE_BATCH") == "1":
        try:
            from meilisearch_tpu.search.perform import perform_search_many

            batch = [dict(q) for _ in range(max(rounds, 3)) for q in queries]
            perform_search_many(store, [dict(q) for q in queries])  # compile
            t0 = time.perf_counter()
            perform_search_many(store, batch)
            batched_qps = round(len(batch) / (time.perf_counter() - t0), 2)
        except Exception:
            pass

    result = {
        "metric": "queries_per_sec_hackernews_synthetic_%dk" % (n_docs // 1000),
        "value": round(qps, 2),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps, 2),
        "p50_ms": round(p50_ms, 2),
        "indexing_docs_per_sec": round(n_docs / index_s, 1),
        "n_docs": n_docs,
        "corpus_gen_s": round(gen_s, 2),
    }
    if batched_qps is not None:
        result["batched_qps"] = batched_qps
    print(json.dumps(result))


if __name__ == "__main__":
    main()
