"""Golden port of the reference search-metadata HTTP suite
(crates/meilisearch/tests/search/metadata.rs): the
`Meili-Include-Metadata` request header adds a `metadata` object —
{query, queryUid (UUIDv7), indexUid, primaryKey} — to search and
multi-search responses; absent without the header or with any
non-"true"/"1" value."""

import uuid

import pytest

from meilisearch_tpu.api.app import App, TestClient

DOCUMENTS = [
    {"id": "287947", "title": "Shazam!", "color": ["green", "blue"]},
    {"id": "299537", "title": "Captain Marvel", "color": ["yellow", "blue"]},
    {"id": "450465", "title": "Gläss", "color": ["blue", "red"]},
    {
        "id": "166428",
        "title": "How to Train Your Dragon: The Hidden World",
        "color": ["green", "red"],
    },
]

HEADER = {"Meili-Include-Metadata": "true"}


@pytest.fixture
def client():
    app = App()
    c = TestClient(app)
    c.add_documents("test", DOCUMENTS, primary_key="id")
    yield c
    app.scheduler.stop()


def _check_meta(meta, query, index_uid, primary_key):
    # field ORDER is part of the snapshot surface
    assert list(meta.keys()) == ["query", "queryUid", "indexUid", "primaryKey"]
    assert meta["query"] == query
    assert meta["indexUid"] == index_uid
    assert meta["primaryKey"] == primary_key
    u = uuid.UUID(meta["queryUid"])
    assert u.version == 7


def test_search_without_metadata_header(client):
    res = client.post("/indexes/test/search", body={"q": "glass"})
    assert res.status == 200, res.json
    assert "metadata" not in res.json
    assert [h["id"] for h in res.json["hits"]] == ["450465"]


def test_search_with_metadata_header(client):
    res = client.post(
        "/indexes/test/search", body={"q": "glass"}, headers=HEADER
    )
    assert res.status == 200, res.json
    body = res.json
    assert [h["id"] for h in body["hits"]] == ["450465"]
    _check_meta(body["metadata"], "glass", "test", "id")
    # metadata serializes after requestUid (snapshot field order)
    keys = list(body.keys())
    assert keys.index("metadata") > keys.index("requestUid")


def test_search_metadata_header_false_value(client):
    for v in ("false", "0", "banana"):
        res = client.post(
            "/indexes/test/search",
            body={"q": "glass"},
            headers={"Meili-Include-Metadata": v},
        )
        assert res.status == 200
        assert "metadata" not in res.json, v
    # "1" and case-insensitive "True" both enable
    for v in ("1", "True", "TRUE"):
        res = client.post(
            "/indexes/test/search",
            body={"q": "glass"},
            headers={"Meili-Include-Metadata": v},
        )
        assert "metadata" in res.json, v


def test_multi_search_without_metadata_header(client):
    res = client.post(
        "/multi-search",
        body={
            "queries": [
                {"indexUid": "test", "q": "glass"},
                {"indexUid": "test", "q": "dragon"},
            ]
        },
    )
    assert res.status == 200, res.json
    for r in res.json["results"]:
        assert "metadata" not in r


def test_multi_search_with_metadata_header(client):
    res = client.post(
        "/multi-search",
        body={
            "queries": [
                {"indexUid": "test", "q": "glass"},
                {"indexUid": "test", "q": "dragon"},
            ]
        },
        headers=HEADER,
    )
    assert res.status == 200, res.json
    results = res.json["results"]
    assert [h["id"] for h in results[0]["hits"]] == ["450465"]
    assert [h["id"] for h in results[1]["hits"]] == ["166428"]
    _check_meta(results[0]["metadata"], "glass", "test", "id")
    _check_meta(results[1]["metadata"], "dragon", "test", "id")
    # fresh UUID per query
    assert (
        results[0]["metadata"]["queryUid"] != results[1]["metadata"]["queryUid"]
    )


def test_search_metadata_consistency_across_requests(client):
    uids = set()
    for _ in range(3):
        res = client.post(
            "/indexes/test/search", body={"q": "glass"}, headers=HEADER
        )
        assert res.status == 200
        _check_meta(res.json["metadata"], "glass", "test", "id")
        uids.add(res.json["metadata"]["queryUid"])
    assert len(uids) == 3  # a fresh queryUid per request


def test_federated_search_metadata(client):
    # federated responses carry ONE top-level metadata array in query
    # order (reference federated/perform.rs build_query_metadata)
    res = client.post(
        "/multi-search",
        body={
            "federation": {},
            "queries": [
                {"indexUid": "test", "q": "glass"},
                {"indexUid": "test", "q": "dragon"},
            ],
        },
        headers=HEADER,
    )
    assert res.status == 200, res.json
    meta = res.json["metadata"]
    assert len(meta) == 2
    for m, q in zip(meta, ("glass", "dragon")):
        assert m["query"] == q
        assert m["indexUid"] == "test"
        assert m["primaryKey"] == "id"
        assert uuid.UUID(m["queryUid"]).version == 7
