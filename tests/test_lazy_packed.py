"""Packed v2 lazy serving + memory-budgeted index registry
(VERDICT r2 #3): boot must be O(1) per table, queries must materialize
only the keys they touch, and the scheduler's index map must evict/reload
under a byte budget without losing writes."""

import numpy as np

from meilisearch_tpu.engine.index_map import IndexMap
from meilisearch_tpu.index.packed import load_index, save_index
from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import perform_search

WORDS = [
    "quick", "brown", "fox", "jumps", "lazy", "dog", "salad", "green",
    "movie", "prince", "little", "women", "database", "rust", "search",
]


def build_store(n=3000, uid="lz"):
    rng = np.random.default_rng(11)
    docs = [
        {
            "id": i,
            "title": " ".join(rng.choice(WORDS, size=int(rng.integers(1, 6)))),
            "points": int(rng.integers(0, 100)),
        }
        for i in range(n)
    ]
    s = IndexStore(uid, primary_key="id")
    s.settings.apply_json(
        {
            "searchableAttributes": ["title"],
            "filterableAttributes": ["points"],
            "sortableAttributes": ["points"],
        }
    )
    s.add_documents(docs)
    return s


def test_lazy_load_materializes_only_touched_keys(tmp_path):
    store = build_store()
    d = str(tmp_path / "idx.packed")
    save_index(store, d)

    loaded = load_index(d)
    # boot: nothing materialized
    assert len(loaded.word_docids._loaded) == 0
    assert len(loaded.documents._lru) == 0

    res = perform_search(loaded, {"q": "quick fox", "limit": 5})
    want = perform_search(store, {"q": "quick fox", "limit": 5})
    assert [h["id"] for h in res["hits"]] == [h["id"] for h in want["hits"]]
    # the query touched a handful of posting keys, not the corpus
    assert 0 < len(loaded.word_docids._loaded) < 50
    # only the returned page's documents were decoded
    assert 0 < len(loaded.documents._lru) <= 16


def test_lazy_load_roundtrip_queries(tmp_path):
    store = build_store()
    d = str(tmp_path / "idx.packed")
    save_index(store, d)
    loaded = load_index(d)
    for q in (
        {"q": "databse", "limit": 10},
        {"q": "green salad", "filter": "points > 40", "limit": 10},
        {"q": "fox", "sort": ["points:desc"], "limit": 10},
        {"q": "movie", "facets": ["points"], "limit": 10},
    ):
        a = perform_search(store, dict(q))
        b = perform_search(loaded, dict(q))
        assert [h["id"] for h in a["hits"]] == [h["id"] for h in b["hits"]], q
        assert a.get("facetDistribution") == b.get("facetDistribution"), q


def test_lazy_load_then_write_then_query(tmp_path):
    store = build_store(500)
    d = str(tmp_path / "idx.packed")
    save_index(store, d)
    loaded = load_index(d)

    loaded.add_documents([{"id": 9001, "title": "quick zzfresh", "points": 7}])
    res = perform_search(loaded, {"q": "zzfresh"})
    assert [h["id"] for h in res["hits"]] == [9001]
    loaded.delete_documents(["3"])
    assert loaded.external_to_internal.get("3") is None
    # save again from the lazily-loaded store and reload
    d2 = str(tmp_path / "idx2.packed")
    save_index(loaded, d2)
    again = load_index(d2)
    res = perform_search(again, {"q": "zzfresh"})
    assert [h["id"] for h in res["hits"]] == [9001]
    assert again.external_to_internal.get("3") is None
    assert len(again.documents) == len(loaded.documents)


def test_index_map_budget_eviction(tmp_path):
    m = IndexMap(db_dir=str(tmp_path))
    m.budget_bytes = 1  # force eviction beyond a single index
    a = build_store(300, uid="a")
    b = build_store(300, uid="b")
    m["a"] = a
    m["b"] = b  # budget forces `a` out (dirty -> saved to db_dir)
    assert m.evictions >= 1
    assert "a" in m and "b" in m
    ra = m["a"]  # transparent reload
    assert ra is not a  # a fresh object from the packed dir
    res = perform_search(ra, {"q": "quick", "limit": 3})
    want = perform_search(a, {"q": "quick", "limit": 3})
    assert [h["id"] for h in res["hits"]] == [h["id"] for h in want["hits"]]


def test_index_map_deferred_registration(tmp_path):
    store = build_store(200, uid="boot")
    d = str(tmp_path / "boot.packed")
    save_index(store, d)
    m = IndexMap(db_dir=str(tmp_path))
    m.register_deferred("boot", d)
    assert "boot" in m and len(m) == 1
    loaded = m["boot"]
    assert len(loaded.documents) == 200
