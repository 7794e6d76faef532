"""Golden port of the reference content-type suite
(crates/meilisearch/tests/content_type.rs): strict-JSON routes return
415 with the pinned missing/invalid content-type errors; a charset
suffix on application/json is accepted."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

ROUTES = [
    # content_type.rs:35-48 (strict-JSON, body-bearing routes)
    ("POST", "/indexes"),
    ("POST", "/indexes/doggo/documents/delete-batch"),
    ("POST", "/indexes/doggo/search"),
    ("PATCH", "/indexes/doggo/settings"),
    ("PUT", "/indexes/doggo/settings/displayed-attributes"),
    ("PUT", "/indexes/doggo/settings/distinct-attribute"),
    ("PUT", "/indexes/doggo/settings/filterable-attributes"),
    ("PUT", "/indexes/doggo/settings/ranking-rules"),
    ("PUT", "/indexes/doggo/settings/searchable-attributes"),
    ("PUT", "/indexes/doggo/settings/sortable-attributes"),
    ("PUT", "/indexes/doggo/settings/stop-words"),
    ("PUT", "/indexes/doggo/settings/synonyms"),
]

BAD_CONTENT_TYPES = [
    "application/csv",
    "application/x-ndjson",
    "application/x-www-form-urlencoded",
    "text/plain",
    "json",
    "application",
    "json/application",
]


@pytest.fixture(scope="module")
def client():
    app = App()
    c = TestClient(app)
    yield c
    app.scheduler.stop()


def send(client, verb, route, ct):
    headers = {"Content-Type": ct} if ct is not None else {}
    # raw_body only: mimics a wire request where the body was never
    # parsed (the server only parses application/json payloads)
    return client.request(
        verb, route, raw_body=b"{}", headers=headers or None
    )


@pytest.mark.parametrize("verb,route", ROUTES)
def test_good_content_type_not_415(client, verb, route):
    res = client.request(
        verb, route, body={}, headers={"Content-Type": "application/json"}
    )
    assert res.status != 415, (verb, route)


@pytest.mark.parametrize("verb,route", ROUTES)
def test_missing_content_type(client, verb, route):
    res = send(client, verb, route, None)
    assert res.status == 415, (verb, route, res.json)
    assert res.json == {
        "message": "A Content-Type header is missing. Accepted values for"
        " the Content-Type header are: `application/json`",
        "code": "missing_content_type",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#missing_content_type",
    }


@pytest.mark.parametrize("bad", BAD_CONTENT_TYPES)
def test_invalid_content_type(client, bad):
    for verb, route in ROUTES[:3]:
        res = send(client, verb, route, bad)
        assert res.status == 415, (verb, route, bad, res.json)
        assert res.json == {
            "message": f"The Content-Type `{bad}` is invalid. Accepted"
            " values for the Content-Type header are: `application/json`",
            "code": "invalid_content_type",
            "type": "invalid_request",
            "link": "https://docs.meilisearch.com/errors#invalid_content_type",
        }


def test_extract_actual_content_type(client):
    # content_type.rs:133 — charset parameters are stripped
    res = client.request(
        "POST",
        "/indexes/doggo/documents",
        raw_body=b"[{}]",
        headers={"Content-Type": "application/json; charset=utf-8"},
    )
    assert res.status != 415
    res = client.request(
        "PUT",
        "/indexes/doggo/documents",
        raw_body=b"[{}]",
        headers={"Content-Type": "application/json; charset=latin-1"},
    )
    assert res.status != 415
