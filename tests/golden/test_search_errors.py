"""Golden port of the reference search-error suite
(crates/meilisearch/tests/search/errors.rs): exact error messages, codes
and statuses for invalid search parameters."""

import pytest

from meilisearch_tpu.api.app import App, TestClient


@pytest.fixture(scope="module")
def client():
    app = App()
    c = TestClient(app)
    c.add_documents("movies", [{"id": 1, "title": "doc"}])
    yield c
    app.scheduler.stop()


def err(client, body, index="movies"):
    res = client.post(f"/indexes/{index}/search", body=body)
    return res.status, res.json


def test_search_unexisting_index(client):
    status, body = err(client, {"q": "hello"}, index="DOES_NOT_EXISTS")
    assert status == 404
    assert body == {
        "message": "Index `DOES_NOT_EXISTS` not found.",
        "code": "index_not_found",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#index_not_found",
    }


def test_search_unexisting_parameter(client):
    status, body = err(client, {"marin": "hello"})
    assert status == 400
    assert body["code"] == "bad_request"


def test_search_bad_q(client):
    status, body = err(client, {"q": ["doggo"]})
    assert status == 400
    assert body == {
        "message": 'Invalid value type at `.q`: expected a string, but'
        ' found an array: `["doggo"]`',
        "code": "invalid_search_q",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#invalid_search_q",
    }


@pytest.mark.parametrize(
    "field,code",
    [
        ("offset", "invalid_search_offset"),
        ("limit", "invalid_search_limit"),
        ("page", "invalid_search_page"),
        ("hitsPerPage", "invalid_search_hits_per_page"),
    ],
)
def test_search_bad_int_params(client, field, code):
    status, body = err(client, {field: "doggo"})
    assert status == 400
    assert body == {
        "message": f"Invalid value type at `.{field}`: expected a positive"
        ' integer, but found a string: `"doggo"`',
        "code": code,
        "type": "invalid_request",
        "link": f"https://docs.meilisearch.com/errors#{code}",
    }


def test_search_bad_filter(client):
    status, body = err(client, {"filter": True})
    assert status == 400
    assert body == {
        "message": "Invalid syntax for the filter parameter: `expected"
        " String, Array, found: true`.",
        "code": "invalid_search_filter",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#invalid_search_filter",
    }


def test_search_bad_sort(client):
    status, body = err(client, {"sort": "doggo"})
    assert status == 400
    assert body == {
        "message": "Invalid value type at `.sort`: expected an array, but"
        ' found a string: `"doggo"`',
        "code": "invalid_search_sort",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#invalid_search_sort",
    }


def test_search_bad_show_matches_position(client):
    status, body = err(client, {"showMatchesPosition": "doggo"})
    assert status == 400
    assert body == {
        "message": "Invalid value type at `.showMatchesPosition`: expected"
        ' a boolean, but found a string: `"doggo"`',
        "code": "invalid_search_show_matches_position",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors"
        "#invalid_search_show_matches_position",
    }


def test_search_bad_facets(client):
    status, body = err(client, {"facets": "doggo"})
    assert status == 400
    assert body == {
        "message": "Invalid value type at `.facets`: expected an array, but"
        ' found a string: `"doggo"`',
        "code": "invalid_search_facets",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#invalid_search_facets",
    }


def test_search_bad_matching_strategy(client):
    status, body = err(client, {"matchingStrategy": "doggo"})
    assert status == 400
    assert body["code"] == "invalid_search_matching_strategy"


def test_search_invalid_threshold(client):
    status, body = err(client, {"rankingScoreThreshold": 42})
    assert status == 400
    assert body["code"] == "invalid_search_ranking_score_threshold"
