"""Randomized ranking differentials.

Three independent implementations of the ranking semantics must agree on
randomized corpora and query shapes:
  host packed bit-field DP == host matrix DP == batched device kernel.
"""

import numpy as np
import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search import device_batch
from meilisearch_tpu.search import scorer as scorer_mod
from meilisearch_tpu.search.perform import perform_search, perform_search_many

VOCAB = [
    "apple", "apples", "banana", "bananas", "cherry", "cherries", "grape",
    "mango", "melon", "peach", "pear", "plum", "berry", "berries", "kiwi",
    "aple", "banan", "chery",  # typo bait
]


def _random_store(seed: int) -> IndexStore:
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(int(rng.integers(30, 200))):
        fields = {"id": i}
        fields["title"] = " ".join(rng.choice(VOCAB, size=int(rng.integers(1, 7))))
        if rng.random() < 0.6:
            fields["body"] = " ".join(
                rng.choice(VOCAB, size=int(rng.integers(0, 10)))
            )
        docs.append(fields)
    store = IndexStore(f"fuzz{seed}", primary_key="id")
    store.settings.apply_json({"searchableAttributes": ["title", "body"]})
    store.add_documents(docs)
    return store


def _random_queries(seed: int) -> list[dict]:
    rng = np.random.default_rng(seed + 1000)
    out = []
    for _ in range(8):
        n = int(rng.integers(1, 4))
        words = list(rng.choice(VOCAB, size=n))
        q = " ".join(words)
        if rng.random() < 0.25 and n >= 2:
            q = f'"{words[0]} {words[1]}"' + (
                " " + " ".join(words[2:]) if n > 2 else ""
            )
        out.append({"q": q, "limit": 30})
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_packed_matrix_device_agree(monkeypatch, seed):
    monkeypatch.setenv("MEILI_TPU_DEVICE_BATCH", "1")
    monkeypatch.setenv("MEILI_TPU_DEVICE_STRICT", "1")
    store = _random_store(seed)
    queries = _random_queries(seed)

    packed = [
        [h["id"] for h in perform_search(store, dict(q))["hits"]]
        for q in queries
    ]

    orig = scorer_mod.FusedScorer._prepare_packing

    def no_packing(self):
        orig(self)
        self._packed_ok = False

    monkeypatch.setattr(scorer_mod.FusedScorer, "_prepare_packing", no_packing)
    matrix = [
        [h["id"] for h in perform_search(store, dict(q))["hits"]]
        for q in queries
    ]
    monkeypatch.setattr(scorer_mod.FusedScorer, "_prepare_packing", orig)

    assert packed == matrix, f"packed != matrix DP for seed {seed}"

    device = [
        [h["id"] for h in r["hits"]]
        for r in perform_search_many(store, [dict(q) for q in queries])
    ]
    assert packed == device, f"host != device batch for seed {seed}"

    # chain queries must actually take the device path for this to mean
    # anything: at least the plain multi-word queries are eligible
    from meilisearch_tpu.search.executor import Search

    eligible = sum(
        device_batch.build_descriptor(Search(store, query=q["q"])) is not None
        for q in queries
    )
    assert eligible >= 3
