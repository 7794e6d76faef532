"""Golden port of the reference settings error suite
(crates/meilisearch/tests/settings/errors.rs): exact deserr messages and
per-setting error codes, on both the full settings route and the dedicated
sub-routes."""

import pytest

from meilisearch_tpu.api.app import App, TestClient


@pytest.fixture(scope="module")
def client():
    app = App()
    c = TestClient(app)
    yield c
    app.scheduler.stop()


def err(client, body):
    res = client.patch("/indexes/e/settings", body=body)
    assert res.status == 400, res.json
    return res.json


def sub_err(client, route, body, verb="put"):
    res = getattr(client, verb)(f"/indexes/e/settings/{route}", body=body)
    assert res.status == 400, res.json
    return res.json


ARRAY_CASES = [
    ("displayedAttributes", "displayed-attributes",
     "invalid_settings_displayed_attributes"),
    ("searchableAttributes", "searchable-attributes",
     "invalid_settings_searchable_attributes"),
    ("filterableAttributes", "filterable-attributes",
     "invalid_settings_filterable_attributes"),
    ("sortableAttributes", "sortable-attributes",
     "invalid_settings_sortable_attributes"),
    ("rankingRules", "ranking-rules", "invalid_settings_ranking_rules"),
    ("stopWords", "stop-words", "invalid_settings_stop_words"),
]


@pytest.mark.parametrize("key,route,code", ARRAY_CASES)
def test_settings_bad_array_type(client, key, route, code):
    r = err(client, {key: "doggo"})
    assert r == {
        "message": f"Invalid value type at `.{key}`: expected an array, but"
        ' found a string: `"doggo"`',
        "code": code,
        "type": "invalid_request",
        "link": f"https://docs.meilisearch.com/errors#{code}",
    }
    r = sub_err(client, route, "doggo")
    assert r["message"] == (
        'Invalid value type: expected an array, but found a string:'
        ' `"doggo"`'
    )
    assert r["code"] == code


def test_settings_bad_synonyms(client):
    r = err(client, {"synonyms": "doggo"})
    assert r["message"] == (
        "Invalid value type at `.synonyms`: expected an object, but found a"
        ' string: `"doggo"`'
    )
    assert r["code"] == "invalid_settings_synonyms"
    r = sub_err(client, "synonyms", "doggo")
    assert r["message"] == (
        'Invalid value type: expected an object, but found a string:'
        ' `"doggo"`'
    )


def test_settings_bad_distinct_attribute(client):
    r = err(client, {"distinctAttribute": ["doggo"]})
    assert r["message"] == (
        "Invalid value type at `.distinctAttribute`: expected a string, but"
        ' found an array: `["doggo"]`'
    )
    assert r["code"] == "invalid_settings_distinct_attribute"
    r = sub_err(client, "distinct-attribute", ["doggo"])
    assert r["message"] == (
        'Invalid value type: expected a string, but found an array:'
        ' `["doggo"]`'
    )


def test_settings_bad_typo_tolerance(client):
    r = err(client, {"typoTolerance": "doggo"})
    assert r["message"] == (
        "Invalid value type at `.typoTolerance`: expected an object, but"
        ' found a string: `"doggo"`'
    )
    assert r["code"] == "invalid_settings_typo_tolerance"

    r = err(client, {"typoTolerance": {"minWordSizeForTypos": "doggo"}})
    assert r["message"] == (
        "Invalid value type at `.typoTolerance.minWordSizeForTypos`:"
        ' expected an object, but found a string: `"doggo"`'
    )

    r = sub_err(client, "typo-tolerance", "doggo", verb="patch")
    assert r["message"] == (
        'Invalid value type: expected an object, but found a string:'
        ' `"doggo"`'
    )

    r = sub_err(
        client, "typo-tolerance", {"typoTolerance": {"enabled": True}},
        verb="patch",
    )
    assert r["message"] == (
        "Unknown field `typoTolerance`: expected one of `enabled`,"
        " `minWordSizeForTypos`, `disableOnWords`, `disableOnAttributes`,"
        " `disableOnNumbers`"
    )


def test_settings_bad_faceting(client):
    r = err(client, {"faceting": "doggo"})
    assert r["message"] == (
        "Invalid value type at `.faceting`: expected an object, but found a"
        ' string: `"doggo"`'
    )
    assert r["code"] == "invalid_settings_faceting"
    r = sub_err(client, "faceting", "doggo", verb="patch")
    assert r["message"] == (
        'Invalid value type: expected an object, but found a string:'
        ' `"doggo"`'
    )


def test_settings_bad_pagination(client):
    r = err(client, {"pagination": "doggo"})
    assert r["message"] == (
        "Invalid value type at `.pagination`: expected an object, but found"
        ' a string: `"doggo"`'
    )
    assert r["code"] == "invalid_settings_pagination"
    r = sub_err(client, "pagination", "doggo", verb="patch")
    assert r["message"] == (
        'Invalid value type: expected an object, but found a string:'
        ' `"doggo"`'
    )


def test_settings_bad_max_total_hits(client):
    r = err(client, {"pagination": {"maxTotalHits": "doggo"}})
    assert r == {
        "message": "Invalid value type at `.pagination.maxTotalHits`:"
        ' expected a positive integer, but found a string: `"doggo"`',
        "code": "invalid_settings_pagination",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors"
        "#invalid_settings_pagination",
    }
    r = sub_err(client, "pagination", {"maxTotalHits": "doggo"}, verb="patch")
    assert r["message"] == (
        "Invalid value type at `.maxTotalHits`: expected a positive"
        ' integer, but found a string: `"doggo"`'
    )
    r = sub_err(client, "pagination", {"maxTotalHits": 0}, verb="patch")
    assert r["message"] == (
        "Invalid value at `.maxTotalHits`: a non-zero integer value lower"
        " than `18446744073709551615` was expected, but found a zero"
    )


def test_settings_bad_search_cutoff_ms(client):
    r = err(client, {"searchCutoffMs": "doggo"})
    assert r == {
        "message": "Invalid value type at `.searchCutoffMs`: expected a"
        ' positive integer, but found a string: `"doggo"`',
        "code": "invalid_settings_search_cutoff_ms",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors"
        "#invalid_settings_search_cutoff_ms",
    }
    r = sub_err(client, "search-cutoff-ms", "doggo")
    assert r["message"] == (
        "Invalid value type: expected a positive integer, but found a"
        ' string: `"doggo"`'
    )


@pytest.mark.parametrize(
    "rules",
    [
        ["words", "attribute", "attributeRank"],
        ["attribute", "wordPosition"],
        ["attribute", "attributeRank", "wordPosition"],
        ["typo", "attribute", "wordPosition", "exactness"],
    ],
)
def test_settings_mixed_attribute_ranking_rules(client, rules):
    r = err(client, {"rankingRules": rules})
    assert r == {
        "message": "Mixed usage of the attribute, attributeRank, and"
        " wordPosition ranking rules. You must either use the attribute"
        " ranking rule alone or the attributeRank and wordPosition ranking"
        " rules.",
        "code": "invalid_settings_ranking_rules",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors"
        "#invalid_settings_ranking_rules",
    }


def test_settings_mixed_attribute_rules_sub_route(client):
    r = sub_err(client, "ranking-rules", ["attribute", "attributeRank"])
    assert r["message"].startswith("Mixed usage of the attribute")
    assert r["code"] == "invalid_settings_ranking_rules"
