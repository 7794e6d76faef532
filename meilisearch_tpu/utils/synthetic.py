"""Synthetic corpus generation for benchmarks.

The reference benches replay the hackernews workload (~1M news posts with
title/url/author/points/comments, workloads/hackernews.json). With zero
network egress we synthesize a corpus with a similar shape: Zipfian title
vocabulary, numeric facets, author facet, timestamps.
"""

from __future__ import annotations

import numpy as np

WORDS = """
show tell launch open source rust python golang javascript react database
search engine fast scalable distributed systems cloud startup funding google
apple microsoft amazon facebook meta twitter tesla spacex ai machine learning
deep neural network model training inference gpu tpu chip silicon compiler
kernel linux windows macos security privacy encryption blockchain bitcoin
crypto web app mobile ios android framework library tool cli api graphql rest
http server client network protocol performance benchmark memory cache disk
ssd latency throughput query index data analytics visualization dashboard
monitoring logging tracing debugging testing deployment docker kubernetes
container serverless lambda edge cdn dns tls quantum research paper science
math physics biology chemistry space astronomy climate energy battery solar
electric vehicle robot drone hardware firmware embedded iot sensor arduino
raspberry history book review interview podcast video stream music game
design art typography font color layout css html dom browser chrome firefox
safari extension plugin update release version bug fix feature request issue
""".split()


def generate_hackernews_like(n_docs: int, seed: int = 42) -> list[dict]:
    rng = np.random.default_rng(seed)
    vocab = np.array(WORDS)
    # zipfian word frequencies
    ranks = np.arange(1, len(vocab) + 1)
    probs = 1.0 / ranks
    probs /= probs.sum()

    authors = [f"user{i}" for i in range(max(10, n_docs // 200))]
    docs = []
    title_lens = rng.integers(3, 12, size=n_docs)
    for i in range(n_docs):
        words = rng.choice(vocab, size=title_lens[i], p=probs)
        docs.append(
            {
                "id": i,
                "title": " ".join(words.tolist()),
                "url": f"https://example.com/{i}",
                "author": authors[int(rng.integers(0, len(authors)))],
                "points": int(rng.integers(0, 5000)),
                "num_comments": int(rng.integers(0, 500)),
                "created_at": int(1500000000 + rng.integers(0, 200000000)),
            }
        )
    return docs


QUERY_SET = [
    "rust",
    "machine learning",
    "open source database",
    "show tell",
    "python web framework",
    "distributed systems",
    "searhc engine",  # typo
    "kubernets",  # typo
    "deep neural network training",
    "performance benchark memory",  # typo
    "javascrit",  # typo (prefix-ish)
    "ai",
    "quantum research paper",
    "google",
    "security privacy encryption",
]
