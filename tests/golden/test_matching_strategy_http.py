"""Golden port of the reference matching-strategy HTTP suite
(crates/meilisearch/tests/search/matching_strategy.rs): same documents,
queries, and EXACT snapshot hit orders for last/all/frequency, with and
without typos and unknown words."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

DOCS = [
    {"title": "Shazam!", "id": "1"},
    {"title": "Captain Planet", "id": "2"},
    {"title": "Captain Marvel", "id": "3"},
    {"title": "a Captain Marvel ersatz", "id": "4"},
    {"title": "He's not part of the Marvel Cinematic Universe", "id": "5"},
    {"title": "a Shazam ersatz, but better than Captain Planet", "id": "6"},
    {"title": "Capitain CAAAAAVEEERNE!!!!", "id": "7"},
]


@pytest.fixture(scope="module")
def client():
    app = App()
    c = TestClient(app)
    c.add_documents("movies", DOCS)
    yield c
    app.scheduler.stop()


def ids(client, q, strategy):
    res = client.search(
        "movies",
        {"q": q, "matchingStrategy": strategy, "attributesToRetrieve": ["id"]},
    )
    assert res.status == 200, res.json
    return [h["id"] for h in res.json["hits"]]


@pytest.mark.parametrize(
    "strategy,expected",
    [
        ("last", ["3", "4", "2", "6", "7"]),
        ("all", ["3", "4"]),
        ("frequency", ["3", "4", "5"]),
    ],
)
def test_simple_search(client, strategy, expected):
    assert ids(client, "Captain Marvel", strategy) == expected


@pytest.mark.parametrize(
    "strategy,expected",
    [
        ("last", ["3", "4", "7", "2", "6"]),
        ("all", ["3", "4"]),
        ("frequency", ["3", "4", "5"]),
    ],
)
def test_search_with_typo(client, strategy, expected):
    assert ids(client, "Capitain Marvel", strategy) == expected


@pytest.mark.parametrize(
    "strategy,expected",
    [
        ("last", ["2", "3", "4", "6", "7"]),
        ("all", []),
        ("frequency", ["3", "4", "5"]),
    ],
)
def test_search_with_unknown_word(client, strategy, expected):
    assert ids(client, "Captain Supercopter Marvel", strategy) == expected
