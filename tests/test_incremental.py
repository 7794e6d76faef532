"""Incremental generations (VERDICT r2 #2): minor writes must not flush
the device arena or derivation caches, and the device path (base snapshot
+ host delta overlay, search/device_batch.py score_delta) must stay
byte-exact with the host scorer through adds / edits / deletes."""

import numpy as np
import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search import device_batch
from meilisearch_tpu.search.perform import perform_search, perform_search_many

WORDS = [
    "quick", "brown", "fox", "jumps", "lazy", "dog", "salad", "green",
    "movie", "prince", "little", "women", "database", "rust", "search",
    "engine", "cloud", "kernel",
]


@pytest.fixture(autouse=True)
def _enable_device_batch(monkeypatch):
    monkeypatch.setenv("MEILI_TPU_DEVICE_BATCH", "1")
    monkeypatch.setenv("MEILI_TPU_DEVICE_STRICT", "1")


def make_store(n=300, seed=3):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        docs.append(
            {
                "id": i,
                "title": " ".join(
                    rng.choice(WORDS, size=int(rng.integers(1, 7)))
                ),
                "points": int(rng.integers(0, 50)),
            }
        )
    s = IndexStore("inc", primary_key="id")
    s.settings.apply_json(
        {
            "searchableAttributes": ["title"],
            "filterableAttributes": ["points"],
            "sortableAttributes": ["points"],
        }
    )
    s.add_documents(docs)
    return s


QUERIES = [
    {"q": "quick brown"},
    {"q": "databse rust"},  # typos
    {"q": "zzznovel"},  # word that only delta docs will contain
    {"q": "fox", "filter": "points > 20"},
    {"q": "quick", "sort": ["points:desc"]},
    {"q": "green", "facets": ["points"]},
]


def check_parity(store):
    serial = [perform_search(store, dict(q)) for q in QUERIES]
    batched = perform_search_many(store, [dict(q) for q in QUERIES])
    for q, s, b in zip(QUERIES, serial, batched):
        assert [h["id"] for h in s["hits"]] == [
            h["id"] for h in b["hits"]
        ], f"order mismatch for {q}"
        for key in ("estimatedTotalHits", "facetDistribution", "facetStats"):
            assert s.get(key) == b.get(key), f"{key} mismatch for {q}"


def test_minor_writes_keep_base_and_stay_exact():
    store = make_store()
    # anchor the caches: run queries once so the arena/derivations build
    perform_search_many(store, [dict(q) for q in QUERIES])
    base_gen = store.base_generation

    rng = np.random.default_rng(9)
    next_id = 1000
    for step in range(6):
        kind = step % 3
        if kind == 0:  # fresh docs, including brand-new vocabulary
            docs = [
                {
                    "id": next_id + j,
                    "title": "zzznovel "
                    + " ".join(rng.choice(WORDS, size=3)),
                    "points": int(rng.integers(0, 50)),
                }
                for j in range(3)
            ]
            next_id += 3
            store.add_documents(docs)
        elif kind == 1:  # edit existing docs (docid reuse)
            docs = [
                {
                    "id": int(rng.integers(0, 300)),
                    "title": " ".join(rng.choice(WORDS, size=4)),
                    "points": int(rng.integers(0, 50)),
                }
                for _ in range(2)
            ]
            store.add_documents(docs)
        else:  # delete
            store.delete_documents([str(int(rng.integers(0, 300)))])
        assert store.base_generation == base_gen, "minor write promoted base"
        assert store.delta_docids or kind == 2
        check_parity(store)


def test_minor_write_does_not_flush_anchored_caches():
    store = make_store()
    perform_search_many(store, [{"q": "quick brown"}])
    arena = store._device_arena
    rows_before = dict(arena._byte_rows)
    assert rows_before, "device rows should be registered"
    struct_before = device_batch._device_struct_cache(store)
    assert struct_before, "device struct cache should be warm"
    base_terms = store._derivation_store_cache["base_terms"]
    assert base_terms, "base derivations should be cached"

    store.add_documents([{"id": 7777, "title": "quick zzzfresh"}])

    # same objects, still populated: no flush happened
    assert store._device_arena is arena
    arena._reset_if_stale()
    assert arena._byte_rows == rows_before
    assert device_batch._device_struct_cache(store) is struct_before
    assert store._derivation_store_cache["base_terms"] is base_terms
    # and the write is immediately visible, exactly
    res = perform_search_many(store, [{"q": "quick zzzfresh"}])[0]
    assert [h["id"] for h in res["hits"]] == [
        h["id"] for h in perform_search(store, {"q": "quick zzzfresh"})["hits"]
    ]
    assert any(h["id"] == 7777 for h in res["hits"])


def test_delta_promotion_at_cap(monkeypatch):
    monkeypatch.setenv("MEILI_TPU_DELTA_CAP", "4")
    store = make_store(50)
    gen0 = store.base_generation
    store.add_documents([{"id": 900, "title": "quick"}])
    assert store.base_generation == gen0
    assert len(store.delta_docids) == 1  # holds INTERNAL docids
    # exceeding the cap promotes: the delta empties and base advances
    store.add_documents(
        [{"id": 901 + j, "title": "brown fox"} for j in range(6)]
    )
    assert store.base_generation > gen0
    assert not store.delta_docids
    check_parity(store)


def test_incremental_vocab_merge_exact():
    """New vocabulary via minor writes must derive exactly: typo matches,
    prefixes and prefix-db behavior against a fresh-store oracle."""
    store = make_store(200, seed=5)
    perform_search_many(store, [{"q": "quick"}])  # anchor vocab snapshot
    extra = [
        {"id": 5000, "title": "qqxyzzy alpha"},
        {"id": 5001, "title": "qqxyzzz beta"},
        {"id": 5002, "title": "quix gamma"},  # 1 typo from quick
    ]
    store.add_documents(extra)
    assert store.delta_docids, "adds should be minor"

    # same docs, same internal-docid ORDER (tie-breaks), same external ids
    oracle = IndexStore("oracle", primary_key="id")
    oracle.settings.apply_json({"searchableAttributes": ["title"]})
    oracle.add_documents(
        [
            {
                "id": store.documents[d]["id"],
                "title": store.documents[d]["title"],
            }
            for d in sorted(store.documents.keys())
        ]
    )
    for q in ("qqxyzz", "quix", "quick", "qqxyzzy alpha"):
        got = perform_search(store, {"q": q})
        want = perform_search(oracle, {"q": q})
        assert [h["id"] for h in got["hits"]] == [
            h["id"] for h in want["hits"]
        ], f"host mismatch for {q!r}"
        dev = perform_search_many(store, [{"q": q}])[0]
        assert [h["id"] for h in dev["hits"]] == [
            h["id"] for h in want["hits"]
        ], f"device mismatch for {q!r}"
