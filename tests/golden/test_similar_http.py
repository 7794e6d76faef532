"""Golden port of the reference similar-documents suite
(crates/meilisearch/tests/similar/mod.rs): same vectors, same expected
neighbor orders, filters, and limit/offset."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

DOCS = [
    {"title": "Shazam!", "release_year": 2019, "id": "287947",
     "_vectors": {"manual": [0.8, 0.4, -0.5]}},
    {"title": "Captain Marvel", "release_year": 2019, "id": "299537",
     "_vectors": {"manual": [0.6, 0.8, -0.2]}},
    {"title": "Escape Room", "release_year": 2019, "id": "522681",
     "_vectors": {"manual": [0.1, 0.6, 0.8]}},
    {"title": "How to Train Your Dragon: The Hidden World",
     "release_year": 2019, "id": "166428",
     "_vectors": {"manual": [0.7, 0.7, -0.4]}},
    {"title": "All Quiet on the Western Front", "release_year": 1930,
     "id": "143", "_vectors": {"manual": [-0.5, 0.3, 0.85]}},
]


@pytest.fixture(scope="module")
def client():
    app = App()
    c = TestClient(app)
    c.update_settings(
        "movies",
        {
            "embedders": {"manual": {"source": "userProvided", "dimensions": 3}},
            "filterableAttributes": ["title", "release_year"],
        },
    )
    c.add_documents("movies", DOCS)
    yield c
    app.scheduler.stop()


def similar_ids(client, body):
    res = client.post("/indexes/movies/similar", body=body)
    assert res.status == 200, res.json
    return [h["id"] for h in res.json["hits"]]


def test_basic(client):
    ids = similar_ids(client, {"id": 143, "embedder": "manual"})
    assert ids[0] == "522681"  # Escape Room is the nearest to 143
    ids = similar_ids(client, {"id": "299537", "embedder": "manual"})
    assert ids == ["166428", "287947", "522681", "143"]


def test_filter(client):
    ids = similar_ids(
        client,
        {"id": 522681, "filter": "release_year = 2019", "embedder": "manual"},
    )
    assert ids == ["299537", "166428", "287947"]
    ids = similar_ids(
        client,
        {"id": 522681, "filter": "release_year < 2000", "embedder": "manual"},
    )
    assert ids == ["143"]


def test_limit_and_offset(client):
    assert similar_ids(
        client, {"id": 143, "limit": 1, "embedder": "manual"}
    ) == ["522681"]
    assert similar_ids(
        client, {"id": 143, "limit": 1, "offset": 1, "embedder": "manual"}
    ) == ["299537"]
