"""Golden port of the reference performance-details HTTP suite
(crates/meilisearch/tests/search/performance_details.rs):
`showPerformanceDetails` on search and multi-search, the federated
rejection of the per-query flag (moved to `federation.*`), the
federation-level type error, and the always-present `requestUid`."""

import re
import uuid

import pytest

from meilisearch_tpu.api.app import App, TestClient

DOCUMENTS = [
    {"id": "287947", "title": "Shazam!", "color": ["green", "blue"]},
    {"id": "299537", "title": "Captain Marvel", "color": ["yellow", "blue"]},
    {"id": "450465", "title": "Gläss", "color": ["blue", "red"]},
]

DURATION_RE = re.compile(r"^\d+(\.\d+)?(ns|µs|ms|s)$")


@pytest.fixture
def client():
    app = App()
    c = TestClient(app)
    c.add_documents("test", DOCUMENTS, primary_key="id")
    yield c
    app.scheduler.stop()


def check_details(details):
    assert isinstance(details, dict) and details
    for name, dur in details.items():
        assert isinstance(name, str)
        assert DURATION_RE.match(dur), (name, dur)


def test_search(client):
    res = client.search(
        "test", {"q": "glass", "showPerformanceDetails": True}
    )
    assert res.status == 200, res.json
    body = res.json
    assert [h["id"] for h in body["hits"]] == ["450465"]
    assert body["query"] == "glass"
    assert body["limit"] == 20 and body["offset"] == 0
    assert body["estimatedTotalHits"] == 1
    # requestUid is a valid UUID v7
    u = uuid.UUID(body["requestUid"])
    assert u.version == 7
    check_details(body["performanceDetails"])

    # a second request gets a fresh uid
    res2 = client.search("test", {"q": "glass"})
    assert res2.json["requestUid"] != body["requestUid"]
    assert "performanceDetails" not in res2.json


def test_search_invalid_type(client):
    res = client.search(
        "test", {"q": "glass", "showPerformanceDetails": "true"}
    )
    assert res.status == 400
    assert res.json["code"] == "invalid_search_show_performance_details"


def test_multi_search(client):
    res = client.post(
        "/multi-search",
        body={
            "queries": [
                {"indexUid": "test", "q": "glass", "showPerformanceDetails": True}
            ]
        },
    )
    assert res.status == 200, res.json
    result = res.json["results"][0]
    assert [h["id"] for h in result["hits"]] == ["450465"]
    assert uuid.UUID(result["requestUid"]).version == 7
    check_details(result["performanceDetails"])


def test_invalid_federated_search(client):
    res = client.post(
        "/multi-search",
        body={
            "federation": {},
            "queries": [
                {"indexUid": "test", "q": "glass", "showPerformanceDetails": True}
            ],
        },
    )
    assert res.status == 400
    assert res.json == {
        "message": (
            "Inside `.queries[0]`: Using `.showPerformanceDetails` is not"
            " allowed in federated queries.\n - Hint: remove"
            " `showPerformanceDetails` from the query or remove"
            " `federation` from the request"
        ),
        "code": "invalid_multi_search_query_show_performance_details",
        "type": "invalid_request",
        "link": (
            "https://docs.meilisearch.com/errors"
            "#invalid_multi_search_query_show_performance_details"
        ),
    }

    res = client.post(
        "/multi-search",
        body={
            "federation": {"showPerformanceDetails": "true"},
            "queries": [{"indexUid": "test", "q": "glass"}],
        },
    )
    assert res.status == 400
    assert res.json == {
        "message": (
            "Invalid value type at `.federation.showPerformanceDetails`:"
            ' expected a boolean, but found a string: `"true"`'
        ),
        "code": "invalid_search_show_performance_details",
        "type": "invalid_request",
        "link": (
            "https://docs.meilisearch.com/errors"
            "#invalid_search_show_performance_details"
        ),
    }


def test_federated_search(client):
    res = client.post(
        "/multi-search",
        body={
            "federation": {"showPerformanceDetails": True},
            "queries": [{"indexUid": "test", "q": "glass"}],
        },
    )
    assert res.status == 200, res.json
    body = res.json
    hit = body["hits"][0]
    assert hit["id"] == "450465"
    assert hit["_federation"]["indexUid"] == "test"
    assert hit["_federation"]["queriesPosition"] == 0
    assert uuid.UUID(body["requestUid"]).version == 7
    check_details(body["performanceDetails"])
