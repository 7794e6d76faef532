"""Differential: batched device chain execution must reproduce the host
scorer's ordering and totals exactly (search/device_batch.py vs
Search.execute)."""

import numpy as np
import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search import device_batch
from meilisearch_tpu.search.executor import Search
from meilisearch_tpu.search.perform import perform_search, perform_search_many

WORDS = [
    "quick", "brown", "fox", "jumps", "lazy", "dog", "salad", "green",
    "movie", "prince", "little", "women", "database", "rust", "search",
]


@pytest.fixture(autouse=True)
def _enable_device_batch(monkeypatch):
    monkeypatch.setenv("MEILI_TPU_DEVICE_BATCH", "1")
    monkeypatch.setenv("MEILI_TPU_DEVICE_STRICT", "1")


@pytest.fixture(scope="module")
def store():
    rng = np.random.default_rng(7)
    docs = []
    for i in range(400):
        n = int(rng.integers(1, 9))
        title = " ".join(rng.choice(WORDS, size=n))
        body = " ".join(rng.choice(WORDS, size=int(rng.integers(0, 12))))
        docs.append(
            {"id": i, "title": title, "body": body, "points": int(rng.integers(0, 100))}
        )
    # a few typo-bait docs
    docs += [
        {"id": 400, "title": "the quik brown fx", "points": 5},
        {"id": 401, "title": "databse rust serch", "points": 6},
        {"id": 402, "title": "quick brown fox", "points": 7},
    ]
    s = IndexStore("diff", primary_key="id")
    s.settings.apply_json(
        {
            "searchableAttributes": ["title", "body"],
            "filterableAttributes": ["points"],
        }
    )
    s.add_documents(docs)
    return s


QUERIES = [
    {"q": "quick brown fox"},
    {"q": "quick"},
    {"q": "databse rust"},
    {"q": "green salad movie", "limit": 50},
    {"q": "little prince", "offset": 3, "limit": 7},
    {"q": "fox", "filter": "points > 50"},
    {"q": "lazy dog", "filter": "points 10 TO 60"},
    {"q": "quick -brown"},
    {"q": '"quick brown" fox'},  # phrase -> host fallback
    {"q": "rust", "page": 1, "hitsPerPage": 5},
]


def test_device_batch_matches_host(store):
    serial = [perform_search(store, dict(q)) for q in QUERIES]
    batched = perform_search_many(store, [dict(q) for q in QUERIES])
    for q, s, b in zip(QUERIES, serial, batched):
        assert [h["id"] for h in s["hits"]] == [
            h["id"] for h in b["hits"]
        ], f"order mismatch for {q}"
        for key in ("estimatedTotalHits", "totalHits"):
            assert s.get(key) == b.get(key), f"{key} mismatch for {q}"


def test_device_batch_used_for_chains(store, monkeypatch):
    calls = []
    orig = device_batch.execute_device_batch

    def spy(st, descs):
        calls.append(len(descs))
        return orig(st, descs)

    monkeypatch.setattr(device_batch, "execute_device_batch", spy)
    perform_search_many(store, [{"q": "quick brown"}, {"q": "fox dog"}])
    assert calls == [2]  # both share T=2 -> one device execute


def test_descriptor_rejections(store):
    assert device_batch.build_descriptor(
        Search(store, query="quick", sort_criteria=["points:asc"])
    ) is None
    assert device_batch.build_descriptor(
        Search(store, query="quick", terms_matching_strategy="all")
    ) is None
    assert device_batch.build_descriptor(
        Search(store, query='"quick brown"')
    ) is None
    assert device_batch.build_descriptor(
        Search(store, query="quick", compute_scores=True)
    ) is None
    assert device_batch.build_descriptor(Search(store, query="quick")) is not None


def test_highlighting_through_device_path(store):
    res = perform_search_many(
        store,
        [
            {
                "q": "quick brown",
                "attributesToHighlight": ["title"],
                "limit": 1,
            }
        ],
    )[0]
    hit = res["hits"][0]
    assert "<em>" in hit["_formatted"]["title"]
