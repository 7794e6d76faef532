"""Golden port of the reference geo HTTP suite
(crates/meilisearch/tests/search/geo.rs): string lat/lng acceptance,
bounding-box order, `_geoDistance` in `_geoPoint` sorts (bug 4640), and
words + missing-field Asc rule ordering."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

GEO_DOCS = [
    {
        "id": 1,
        "name": "Taco Truck",
        "address": "444 Salsa Street, Burritoville",
        "type": "Mexican",
        "rating": 9,
        "_geo": {"lat": 34.0522, "lng": -118.2437},
    },
    {
        "id": 2,
        "name": "La Bella Italia",
        "address": "456 Elm Street, Townsville",
        "type": "Italian",
        "rating": 9,
        "_geo": {"lat": "45.4777599", "lng": "9.1967508"},
    },
    {
        "id": 3,
        "name": "Crêpe Truck",
        "address": "2 Billig Avenue, Rouenville",
        "type": "French",
        "rating": 10,
    },
]


@pytest.fixture(scope="module")
def client():
    app = App()
    c = TestClient(app)
    c.update_settings(
        "geo", {"filterableAttributes": ["_geo"], "sortableAttributes": ["_geo"]}
    )
    c.add_documents("geo", GEO_DOCS)
    yield c
    app.scheduler.stop()


def test_geo_sort_with_geo_strings(client):
    res = client.search(
        "geo",
        {
            "filter": "_geoRadius(45.472735, 9.184019, 10000)",
            "sort": ["_geoPoint(0.0, 0.0):asc"],
        },
    )
    assert res.status == 200, res.json


def test_geo_bounding_box_with_string_and_number(client):
    res = client.search(
        "geo", {"filter": "_geoBoundingBox([89, 179], [-89, -179])"}
    )
    assert res.status == 200
    assert [h["id"] for h in res.json["hits"]] == [1, 2]
    assert res.json["estimatedTotalHits"] == 2


def test_bug_4640_geo_distance(client):
    res = client.search(
        "geo", {"sort": ["_geoPoint(45.4777599, 9.1967508):asc"]}
    )
    assert res.status == 200
    hits = res.json["hits"]
    assert [h["id"] for h in hits] == [2, 1, 3]
    assert hits[0]["_geoDistance"] == 0
    # the reference snapshot pins 9714063 m; allow sub-0.1% radius-model
    # difference
    assert abs(hits[1]["_geoDistance"] - 9714063) < 10000
    assert "_geoDistance" not in hits[2]


WORD_DOCS = [
    {"id": 0, "doggo": "jean", "_geo": {"lat": 0, "lng": 0}},
    {"id": 1, "doggo": "intel", "_geo": {"lat": 88, "lng": 0}},
    {"id": 2, "doggo": "jean bob", "_geo": {"lat": -89, "lng": 0}},
    {"id": 3, "doggo": "jean michel", "_geo": {"lat": 0, "lng": 178}},
    {"id": 4, "doggo": "bob marley", "_geo": {"lat": 0, "lng": -179}},
]


@pytest.mark.parametrize(
    "q,expected",
    [("jean", [0, 2, 3]), ("bob", [2, 4]), ("intel", [1])],
)
def test_geo_asc_with_words(q, expected):
    app = App()
    c = TestClient(app)
    c.update_settings(
        "g",
        {
            "searchableAttributes": ["id", "doggo"],
            "rankingRules": ["words", "geo:asc"],
        },
    )
    c.add_documents("g", WORD_DOCS)
    res = c.search("g", {"q": q})
    assert res.status == 200, res.json
    assert [h["id"] for h in res.json["hits"]] == expected
    app.scheduler.stop()
