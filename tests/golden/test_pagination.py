"""Golden port of the reference HTTP pagination suite
(crates/meilisearch/tests/search/pagination.rs): exhaustive-pagination
response shape (page/totalPages/totalHits vs offset/limit/
estimatedTotalHits), page 0 / hitsPerPage 0 semantics, distinct-adjusted
totals, and the rankingScoreThreshold + pagination interaction
(issue 5274)."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

DOCS = [
    {"title": "Shazam!", "id": "287947", "distinct": 1},
    {"title": "Captain Marvel", "id": "299537", "distinct": 4},
    {"title": "Escape Room", "id": "522681", "distinct": 2},
    {
        "title": "How to Train Your Dragon: The Hidden World",
        "id": "166428",
        "distinct": 3,
    },
    {"title": "Glass", "id": "450465", "distinct": 3},
]


@pytest.fixture
def client():
    app = App()
    c = TestClient(app)
    c.add_documents("movies", DOCS)
    yield c
    app.scheduler.stop()


def test_default_search_estimated_total(client):
    res = client.search("movies", {}).json
    assert "estimatedTotalHits" in res and "limit" in res and "offset" in res
    assert "totalHits" not in res
    assert "page" not in res
    assert "totalPages" not in res


def test_simple_page_search(client):
    res = client.search("movies", {"page": 1}).json
    assert len(res["hits"]) == 5
    assert res["totalHits"] == 5
    assert res["page"] == 1
    assert res["totalPages"] == 1
    assert "estimatedTotalHits" not in res
    assert "limit" not in res
    assert "offset" not in res


def test_page_zero_returns_nothing(client):
    res = client.search("movies", {"page": 0}).json
    assert res["hits"] == []
    assert "totalHits" in res
    assert res["page"] == 0
    assert res["totalPages"] == 1


def test_hits_per_page_1(client):
    res = client.search("movies", {"hitsPerPage": 1}).json
    assert len(res["hits"]) == 1
    assert res["totalHits"] == 5
    assert res["page"] == 1
    assert res["totalPages"] == 5


def test_hits_per_page_0(client):
    res = client.search("movies", {"hitsPerPage": 0}).json
    assert res["hits"] == []
    assert res["totalHits"] == 5
    assert res["page"] == 1
    assert res["totalPages"] == 0


def test_placeholder_hit_count_with_distinct(client):
    client.update_settings(
        "movies",
        {"rankingRules": ["distinct:asc"], "distinctAttribute": "distinct"},
    )
    for page in range(0, 5):
        res = client.search("movies", {"page": page, "hitsPerPage": 1}).json
        assert res["totalHits"] == 4, (page, res)
        assert res["totalPages"] == 4, (page, res)


def test_issue_5274_threshold_with_pagination():
    app = App()
    client = TestClient(app)
    client.add_documents(
        "docs",
        [
            {"id": 1, "title": "Document 1", "content": "This is the first."},
            {
                "id": 2,
                "title": "Document 2",
                "content": "This is the second doc.",
            },
        ],
    )
    res = client.search(
        "docs",
        {"q": "doc", "page": 1, "hitsPerPage": 2, "showRankingScore": True},
    ).json
    score = res["hits"][1]["_rankingScore"]
    res = client.search(
        "docs",
        {
            "q": "doc",
            "page": 1,
            "hitsPerPage": 1,
            "rankingScoreThreshold": score + 0.0001,
        },
    ).json
    assert [h["id"] for h in res["hits"]] == [2]
    assert res["totalHits"] == 1
    assert res["totalPages"] == 1
    assert res["page"] == 1
    app.scheduler.stop()
