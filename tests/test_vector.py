"""Vector store, hybrid search, similar documents, binary quantization.
Scenarios mirror crates/meilisearch/tests/vector/ + similar/."""

import numpy as np
import pytest

from meilisearch_tpu.api.app import App, TestClient


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def seed_vectors(client):
    client.update_settings(
        "products",
        {
            "embedders": {
                "manual": {"source": "userProvided", "dimensions": 3}
            }
        },
    )
    client.add_documents(
        "products",
        [
            {"id": 0, "name": "kefir", "_vectors": {"manual": [0.0, 0.0, 1.0]}},
            {"id": 1, "name": "echo", "_vectors": {"manual": [1.0, 0.0, 0.0]}},
            {"id": 2, "name": "intel", "_vectors": {"manual": [0.9, 0.1, 0.0]}},
            {"id": 3, "name": "iko", "_vectors": {"manual": [0.7, 0.7, 0.0]}},
        ],
    )


def test_vector_search(client):
    seed_vectors(client)
    res = client.search(
        "products",
        {
            "vector": [1.0, 0.0, 0.0],
            "hybrid": {"embedder": "manual", "semanticRatio": 1.0},
            "showRankingScore": True,
        },
    )
    assert res.status == 200, res.json
    ids = [h["id"] for h in res.json["hits"]]
    assert ids[:3] == [1, 2, 3]
    assert res.json["semanticHitCount"] == 4
    scores = [h["_rankingScore"] for h in res.json["hits"]]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] == 1.0


def test_vector_requires_hybrid(client):
    seed_vectors(client)
    res = client.search("products", {"vector": [1, 0, 0]})
    assert res.status == 400


def test_hybrid_mix(client):
    seed_vectors(client)
    res = client.search(
        "products",
        {
            "q": "kefir",
            "vector": [1.0, 0.0, 0.0],
            "hybrid": {"embedder": "manual", "semanticRatio": 0.5},
        },
    )
    assert res.status == 200
    ids = [h["id"] for h in res.json["hits"]]
    # keyword match "kefir" (doc 0) and semantic matches both appear
    assert 0 in ids and 1 in ids


def test_retrieve_vectors(client):
    seed_vectors(client)
    res = client.search(
        "products", {"q": "kefir", "retrieveVectors": True}
    )
    hit = res.json["hits"][0]
    assert hit["_vectors"]["manual"]["embeddings"] == [[0.0, 0.0, 1.0]]

    res = client.search("products", {"q": "kefir"})
    assert "_vectors" not in res.json["hits"][0]


def test_similar(client):
    seed_vectors(client)
    res = client.post(
        "/indexes/products/similar",
        body={"id": 1, "embedder": "manual", "showRankingScore": True},
    )
    assert res.status == 200, res.json
    ids = [h["id"] for h in res.json["hits"]]
    assert ids[0] == 2  # closest to echo
    assert 1 not in ids  # the target doc is excluded

    res = client.post(
        "/indexes/products/similar", body={"id": 99, "embedder": "manual"}
    )
    assert res.status == 404


def test_vector_exists_filter(client):
    seed_vectors(client)
    client.add_documents("products", [{"id": 9, "name": "no-vec"}])
    client.update_settings("products", {"filterableAttributes": ["name"]})
    res = client.search("products", {"q": "", "filter": "_vectors.manual EXISTS"})
    ids = {h["id"] for h in res.json["hits"]}
    assert ids == {0, 1, 2, 3}
    res = client.search(
        "products", {"q": "", "filter": "_vectors.manual NOT EXISTS"}
    )
    assert {h["id"] for h in res.json["hits"]} == {9}


def test_binary_quantized(client):
    client.update_settings(
        "bq",
        {
            "embedders": {
                "manual": {
                    "source": "userProvided",
                    "dimensions": 3,
                    "binaryQuantized": True,
                }
            }
        },
    )
    client.add_documents(
        "bq",
        [
            {"id": 0, "_vectors": {"manual": [0.9, -0.2, 0.5]}},
            {"id": 1, "_vectors": {"manual": [-0.5, 0.8, -0.1]}},
        ],
    )
    res = client.search(
        "bq",
        {
            "vector": [1.0, -1.0, 1.0],
            "hybrid": {"embedder": "manual", "semanticRatio": 1.0},
        },
    )
    assert [h["id"] for h in res.json["hits"]] == [0, 1]


def test_invalid_embedder_name(client):
    seed_vectors(client)
    res = client.search(
        "products",
        {"vector": [1, 0, 0], "hybrid": {"embedder": "nope", "semanticRatio": 1.0}},
    )
    assert res.status == 400
    assert res.json["code"] == "invalid_embedder"
