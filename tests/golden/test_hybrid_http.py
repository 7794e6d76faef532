"""Golden port of the reference hybrid-search suite
(crates/meilisearch/tests/search/hybrid.rs, userProvided embedders):
same vectors, queries, expected hit orders, semanticHitCount, and
ranking scores."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

VEC_DOCS = [
    {"title": "Shazam!", "desc": "a Captain Marvel ersatz", "id": "1",
     "_vectors": {"default": [1.0, 3.0]}},
    {"title": "Captain Planet",
     "desc": "He's not part of the Marvel Cinematic Universe", "id": "2",
     "_vectors": {"default": [1.0, 2.0]}},
    {"title": "Captain Marvel", "desc": "a Shazam ersatz", "id": "3",
     "_vectors": {"default": [2.0, 3.0]}},
]

DISTINCT_DOCS = [
    {"id": 0, "search": "Captain Planet",
     "desc": "#2 for keyword search, #3 for hybrid search",
     "_vectors": {"default": [-1.0, 0.0]}, "distinct": 0},
    {"id": 1, "search": "Captain Marvel",
     "desc": "#1 for keyword search, #4 for hybrid search",
     "_vectors": {"default": [-1.0, -1.0]}, "distinct": 1},
    {"id": 2, "search": "Some Captain at least",
     "desc": "#3 for keyword search, #1 for hybrid search",
     "_vectors": {"default": [1.0, 1.0]}, "distinct": 0},
    {"id": 3, "search": "Irrelevant Capitaine",
     "desc": "#4 for keyword search, #2 for hybrid search",
     "_vectors": {"default": [1.0, 0.0]}, "distinct": 1},
]


@pytest.fixture(scope="module")
def client():
    app = App()
    c = TestClient(app)
    c.update_settings(
        "movies",
        {"embedders": {"default": {"source": "userProvided", "dimensions": 2}}},
    )
    c.add_documents("movies", VEC_DOCS)
    yield c
    app.scheduler.stop()


def run(client, body, index="movies"):
    res = client.post(f"/indexes/{index}/search", body=body)
    assert res.status == 200, res.json
    return res.json


def test_simple_search_ratio_02(client):
    r = run(client, {"q": "Captain", "vector": [1.0, 1.0],
                     "hybrid": {"semanticRatio": 0.2, "embedder": "default"}})
    assert [h["id"] for h in r["hits"]] == ["2", "3", "1"]
    assert r["semanticHitCount"] == 0


def test_simple_search_ratio_05(client):
    r = run(client, {"q": "Captain", "vector": [1.0, 1.0],
                     "hybrid": {"semanticRatio": 0.5, "embedder": "default"},
                     "showRankingScore": True})
    assert [h["id"] for h in r["hits"]] == ["3", "2", "1"]
    assert r["semanticHitCount"] == 2
    scores = [h["_rankingScore"] for h in r["hits"]]
    assert abs(scores[0] - 0.990290343761444) < 1e-6
    assert abs(scores[1] - 0.9848484848484848) < 1e-9
    assert abs(scores[2] - 0.9472135901451112) < 1e-6


def test_simple_search_ratio_08(client):
    r = run(client, {"q": "Captain", "vector": [1.0, 1.0],
                     "hybrid": {"semanticRatio": 0.8, "embedder": "default"}})
    assert [h["id"] for h in r["hits"]] == ["3", "2", "1"]
    assert r["semanticHitCount"] == 3


def test_limit_offset(client):
    r = run(client, {"q": "Captain", "vector": [1.0, 1.0],
                     "hybrid": {"semanticRatio": 0.2, "embedder": "default"},
                     "offset": 1, "limit": 1})
    assert [h["id"] for h in r["hits"]] == ["3"]
    assert r["semanticHitCount"] == 0
    r = run(client, {"q": "Captain", "vector": [1.0, 1.0],
                     "hybrid": {"semanticRatio": 0.9, "embedder": "default"},
                     "offset": 1, "limit": 1})
    assert [h["id"] for h in r["hits"]] == ["2"]
    assert r["semanticHitCount"] == 1


def test_query_combination(client):
    # no q, no vector: placeholder, no semantic side
    r = run(client, {"hybrid": {"embedder": "default", "semanticRatio": 1.0},
                     "showRankingScore": True})
    assert [h["id"] for h in r["hits"]] == ["1", "2", "3"]
    assert all(h["_rankingScore"] == 1.0 for h in r["hits"])
    assert r.get("semanticHitCount") is None
    # vector only, full semantic
    r = run(client, {"vector": [1.0, 0.0],
                     "hybrid": {"embedder": "default", "semanticRatio": 1.0},
                     "showRankingScore": True})
    assert [h["id"] for h in r["hits"]] == ["3", "2", "1"]
    scores = [h["_rankingScore"] for h in r["hits"]]
    assert abs(scores[0] - 0.7773500680923462) < 1e-6
    assert abs(scores[1] - 0.7236068248748779) < 1e-6
    assert abs(scores[2] - 0.6581138968467712) < 1e-6
    assert r["semanticHitCount"] == 3
    # vector only but ratio 0: keyword placeholder
    r = run(client, {"vector": [1.0, 0.0],
                     "hybrid": {"embedder": "default", "semanticRatio": 0.0},
                     "showRankingScore": True})
    assert [h["id"] for h in r["hits"]] == ["1", "2", "3"]
    assert r.get("semanticHitCount") is None
    # q + vector, ratio 0: pure keyword scores
    r = run(client, {"q": "Captain", "vector": [1.0, 0.0],
                     "hybrid": {"embedder": "default", "semanticRatio": 0.0},
                     "showRankingScore": True})
    assert [h["id"] for h in r["hits"]] == ["2", "3", "1"]
    scores = [h["_rankingScore"] for h in r["hits"]]
    assert abs(scores[0] - 0.9848484848484848) < 1e-9
    assert abs(scores[1] - 0.9848484848484848) < 1e-9
    assert abs(scores[2] - 0.9242424242424242) < 1e-9
    assert r.get("semanticHitCount") is None


def test_single_document():
    app = App()
    c = TestClient(app)
    c.update_settings(
        "single",
        {"embedders": {"default": {"source": "userProvided", "dimensions": 2}}},
    )
    c.add_documents("single", [VEC_DOCS[0]])
    r = run(c, {"vector": [1.0, 3.0],
                "hybrid": {"semanticRatio": 1.0, "embedder": "default"},
                "showRankingScore": True}, index="single")
    assert [h["id"] for h in r["hits"]] == ["1"]
    assert r["hits"][0]["_rankingScore"] == 1.0
    assert r["semanticHitCount"] == 1
    app.scheduler.stop()


@pytest.mark.parametrize(
    "ratio,expected,count",
    [
        (0.0, [1, 0], None),
        (1.0, [2, 3], 2),
        (0.5, [2, 1], 1),
    ],
)
def test_distinct_is_applied(ratio, expected, count):
    app = App()
    c = TestClient(app)
    c.update_settings(
        "d",
        {"embedders": {"default": {"source": "userProvided", "dimensions": 2}}},
    )
    c.add_documents("d", DISTINCT_DOCS)
    c.update_settings("d", {"distinctAttribute": "distinct"})
    r = run(c, {"q": "Captain Marvel", "vector": [1.0, 1.0],
                "hybrid": {"semanticRatio": ratio, "embedder": "default"}},
            index="d")
    assert [h["id"] for h in r["hits"]] == expected
    assert r.get("semanticHitCount") == count
    app.scheduler.stop()
