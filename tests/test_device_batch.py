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
    for i, d in enumerate(docs):
        if i % 7 != 0:  # some docs lack the facet fields entirely
            d["category"] = ["red", "green", "blue", "cyan"][i % 4]
    s = IndexStore("diff", primary_key="id")
    s.settings.apply_json(
        {
            "searchableAttributes": ["title", "body"],
            "filterableAttributes": ["points", "category"],
            "sortableAttributes": ["points", "category"],
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
    # phrases ride the device path (round 4): phrase-only, phrase+word,
    # word+phrase (proximity edges on both sides of the phrase term)
    {"q": '"quick brown" fox'},
    {"q": '"quick brown fox"'},
    {"q": 'lazy "quick brown"'},
    {"q": '"databse rust" quick'},
    {"q": "rust", "page": 1, "hitsPerPage": 5},
    # offset+limit > K_LADDER[0]: widens the drain to the deep-k program
    {"q": "quick", "offset": 120, "limit": 30},
    # distinct needs the full candidate list -> deep-k program
    {"q": "fox", "distinct": "category"},
    # matchingStrategy=all rides the device path (round 5): all terms
    # mandatory, candidates = docs matching every term
    {"q": "quick brown fox", "matchingStrategy": "all"},
    {"q": "databse rust", "matchingStrategy": "all"},
    {"q": '"quick brown" fox', "matchingStrategy": "all"},
    {"q": "fox lazy", "matchingStrategy": "all", "filter": "points > 20"},
    {"q": "green salad", "matchingStrategy": "all", "sort": ["points:desc"]},
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

    def spy(st, descs, T=6):
        calls.append(len(descs))
        return orig(st, descs, T)

    monkeypatch.setattr(device_batch, "execute_device_batch", spy)
    perform_search_many(store, [{"q": "quick brown"}, {"q": "fox dog"}])
    assert calls == [2]  # both share T=2 -> one device execute


def test_descriptor_rejections(store):
    # round 3: plain-field sort rides the device path
    assert device_batch.build_descriptor(
        Search(store, query="quick", sort_criteria=["points:asc"])
    ) is not None
    # geo sort stays host-side
    assert device_batch.build_descriptor(
        Search(
            store, query="quick",
            sort_criteria=["_geoPoint(1.0, 2.0):asc"],
        )
    ) is None
    # round 5: matchingStrategy=all rides the device path
    assert device_batch.build_descriptor(
        Search(store, query="quick brown", terms_matching_strategy="all")
    ) is not None
    # frequency's removal buckets stay host-side
    assert device_batch.build_descriptor(
        Search(store, query="quick", terms_matching_strategy="frequency")
    ) is None
    # round 4: explicit phrases ride the device path
    assert device_batch.build_descriptor(
        Search(store, query='"quick brown"')
    ) is not None
    # round 5: showRankingScore decodes from the packed DP key on device
    assert device_batch.build_descriptor(
        Search(store, query="quick", compute_scores=True)
    ) is not None
    # ...but details rendering and threshold totals stay host-side
    assert device_batch.build_descriptor(
        Search(store, query="quick", compute_score_details=True)
    ) is None
    assert device_batch.build_descriptor(
        Search(
            store, query="quick", compute_scores=True,
            ranking_score_threshold=0.5,
        )
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


# -- round 3: sort / facets / distinct on the device path ---------------------

WIDE_QUERIES = [
    {"q": "quick", "sort": ["points:desc"]},
    {"q": "quick", "sort": ["points:asc"]},
    {"q": "quick brown", "sort": ["points:desc"], "limit": 50},
    {"q": "fox", "sort": ["category:asc", "points:desc"], "limit": 30},
    {"q": "databse rust", "sort": ["points:desc"]},
    {"q": "fox", "sort": ["points:desc"], "filter": "points > 20"},
    {"q": "quick", "sort": ["points:desc"], "offset": 5, "limit": 10},
    {"q": "quick", "facets": ["points", "category"]},
    {"q": "green salad", "facets": ["category"], "limit": 3},
    {"q": "fox", "facets": ["category"], "filter": "points > 30"},
    {"q": "quick", "distinct": "category"},
    {"q": "quick brown fox", "distinct": "category", "limit": 50},
    {"q": "quick", "distinct": "category", "sort": ["points:desc"]},
    {"q": "quick", "sort": ["points:desc"], "facets": ["category"]},
]


def test_device_sort_facets_distinct_match_host(store):
    serial = [perform_search(store, dict(q)) for q in WIDE_QUERIES]
    batched = perform_search_many(store, [dict(q) for q in WIDE_QUERIES])
    for q, s, b in zip(WIDE_QUERIES, serial, batched):
        assert [h["id"] for h in s["hits"]] == [
            h["id"] for h in b["hits"]
        ], f"order mismatch for {q}"
        for key in ("estimatedTotalHits", "totalHits", "facetDistribution",
                    "facetStats"):
            assert s.get(key) == b.get(key), f"{key} mismatch for {q}"


def test_device_sort_descriptor_served_on_device(store, monkeypatch):
    """The sort/facet queries must actually EXECUTE device-side (not fall
    back), except where quantization legitimately cannot prove the page."""
    served = []
    orig = device_batch.execute_device_batch

    def spy(st, descriptors, T=6):
        res = orig(st, descriptors, T)
        served.append([r is not None for r in res])
        return res

    monkeypatch.setattr(device_batch, "execute_device_batch", spy)
    perform_search_many(
        store,
        [
            {"q": "quick", "sort": ["points:desc"]},
            {"q": "quick", "facets": ["category"]},
            {"q": "quick", "distinct": "category"},
        ],
    )
    assert served and all(all(flags) for flags in served), served


def test_device_sort_tie_truncation_falls_back_exactly():
    """>TOPK docs in one relevance+quantization bucket: the device cannot
    prove the page; the fallback must still produce host-exact results."""
    n = 1500
    docs = [
        {"id": i, "title": "zebra stripe", "points": i % 3}
        for i in range(n)
    ]
    s = IndexStore("ties", primary_key="id")
    s.settings.apply_json(
        {
            "searchableAttributes": ["title"],
            "filterableAttributes": ["points"],
            "sortableAttributes": ["points"],
        }
    )
    s.add_documents(docs)
    q = {"q": "zebra", "sort": ["points:desc"], "limit": 20}
    host = perform_search(s, dict(q))
    dev = perform_search_many(s, [dict(q)])[0]
    assert [h["id"] for h in host["hits"]] == [h["id"] for h in dev["hits"]]
    # maxTotalHits (default 1000) caps the estimate on both paths
    assert host["estimatedTotalHits"] == dev["estimatedTotalHits"]


SCORE_QUERIES = [
    {"q": "quick brown fox", "showRankingScore": True},
    {"q": "quick", "showRankingScore": True},
    {"q": "databse rust", "showRankingScore": True, "limit": 30},
    {"q": '"quick brown" fox', "showRankingScore": True},
    {"q": "fox", "showRankingScore": True, "filter": "points > 50"},
    {"q": "quick brown fox", "matchingStrategy": "all",
     "showRankingScore": True},
    {"q": "quick", "showRankingScore": True, "sort": ["points:desc"]},
    {"q": "green salad", "showRankingScore": True,
     "sort": ["points:desc"], "limit": 25},
    {"q": "quick", "showRankingScore": True, "distinct": "category"},
    {"q": "little prince", "showRankingScore": True, "offset": 2,
     "limit": 8},
]


def test_device_ranking_scores_match_host(store):
    """round 5: _rankingScore decoded from the packed DP key bit fields on
    the device path must equal the host scorer's global_score exactly."""
    serial = [perform_search(store, dict(q)) for q in SCORE_QUERIES]
    batched = perform_search_many(store, [dict(q) for q in SCORE_QUERIES])
    for q, s, b in zip(SCORE_QUERIES, serial, batched):
        assert [h["id"] for h in s["hits"]] == [
            h["id"] for h in b["hits"]
        ], f"order mismatch for {q}"
        host_scores = [h["_rankingScore"] for h in s["hits"]]
        dev_scores = [h["_rankingScore"] for h in b["hits"]]
        assert host_scores == dev_scores, f"score mismatch for {q}"


def test_device_scores_served_on_device(store, monkeypatch):
    """showRankingScore queries must actually EXECUTE device-side."""
    served = []
    orig = device_batch.execute_device_batch

    def spy(st, descriptors, T=6):
        res = orig(st, descriptors, T)
        served.append([r is not None for r in res])
        return res

    monkeypatch.setattr(device_batch, "execute_device_batch", spy)
    perform_search_many(
        store,
        [
            {"q": "quick brown", "showRankingScore": True},
            {"q": "fox", "showRankingScore": True},
        ],
    )
    assert served and all(all(flags) for flags in served), served


def test_plane_encodings():
    """Unit: the packed int8 plane encodings round-trip the kernel's
    decode rules (ops/arena_scorer.py one())."""
    from meilisearch_tpu.index.device_arena import (
        pair_plane, sort_plane, term_plane,
    )

    D = 64
    ids = np.array([3, 10, 40])
    plane = term_plane(
        D, ids, [(np.array([3, 10]), 2), (np.array([40]), 5)],
        [(np.array([3]), 1), (np.array([10, 40]), 9)],
        exact_ids=np.array([10]),
    )
    present = plane != -1
    assert present[ids].all() and present.sum() == 3
    fid = (plane.astype(np.int32) >> 4) & 7
    pos = plane.astype(np.int32) & 15
    assert fid[3] == 2 and fid[10] == 2 and fid[40] == 5
    assert pos[3] == 1 and pos[10] == 9 and pos[40] == 9
    exact = (plane < 0) & present
    assert exact[10] and not exact[3] and not exact[40]

    pp = pair_plane(
        D,
        [
            [(np.array([1, 2]), 0)],
            [(np.array([2]), 1), (np.array([3]), 2)],
            [],
        ],
    )
    c0 = pp.astype(np.int32) & 3
    c1 = (pp.astype(np.int32) >> 2) & 3
    c2 = (pp.astype(np.int32) >> 4) & 3
    assert c0[1] == 0 and c0[2] == 0 and c0[5] == 3
    assert c1[2] == 1 and c1[3] == 2 and c1[1] == 3
    assert (c2 == 3).all()

    sp = sort_plane(D, [np.array([5]), np.array([6]), np.array([7])])
    q = sp.astype(np.int32) + 128
    assert q[5] < q[6] < q[7] < q[0] == 254
