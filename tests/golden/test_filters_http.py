"""Golden port of crates/meilisearch/tests/search/filters.rs: string vs
array filter notation, the experimental CONTAINS gate, pattern-rule
filterable attributes (equality/comparison features), rule priority
(first matching rule wins; fully disabled rules make the attribute NOT
filterable and drop out of the available-patterns list), the
operator-not-allowed Note/Hint surface, and the vector-filter family.

Deliberate deviation: the reference appends a `\\nL:C <context>` span
line to not-filterable errors; this engine pins the message body and
carries spans only on _foreign/IN-rewritten conditions.
"""

import pytest

from meilisearch_tpu.api.app import App, TestClient

DOCUMENTS = [
    {"id": "287947", "title": "Shazam!", "color": ["green", "blue"]},
    {"id": "299537", "title": "Captain Marvel", "color": ["yellow", "blue"]},
    {"id": "522681", "title": "Escape Room", "color": ["yellow", "red"]},
    {
        "id": "166428",
        "title": "How to Train Your Dragon: The Hidden World",
        "color": ["green", "red"],
    },
    {"id": "450465", "title": "Gläss", "color": ["blue", "red"]},
]

# reference tests/common/mod.rs NESTED_DOCUMENTS (fixture copied per
# SURVEY §4.2), minus _vectors which these scenarios don't exercise
NESTED_DOCUMENTS = [
    {
        "id": 852,
        "father": "jean",
        "mother": "michelle",
        "doggos": [{"name": "bobby", "age": 2}, {"name": "buddy", "age": 4}],
        "cattos": "pésti",
    },
    {
        "id": 654,
        "father": "pierre",
        "mother": "sabine",
        "doggos": [{"name": "gros bill", "age": 8}],
        "cattos": ["simba", "pestiféré"],
    },
    {"id": 750, "father": "romain", "mother": "michelle", "cattos": ["enigma"]},
    {
        "id": 951,
        "father": "jean-baptiste",
        "mother": "sophie",
        "doggos": [{"name": "turbo", "age": 5}, {"name": "fast", "age": 6}],
        "cattos": ["moumoute", "gomez"],
    },
]


@pytest.fixture
def app():
    a = App()
    yield a
    a.scheduler.stop()


def _nested(app, settings):
    c = TestClient(app)
    uid = "nested"
    c.delete(f"/indexes/{uid}")
    c.update_settings(uid, settings)
    c.add_documents(uid, NESTED_DOCUMENTS)
    return c


def test_search_with_filter_string_notation(app):
    c = TestClient(app)
    c.update_settings("movies", {"filterableAttributes": ["title"]})
    c.add_documents("movies", DOCUMENTS)
    res = c.post(
        "/indexes/movies/search", body={"filter": "title = Gläss"}
    )
    assert res.status == 200, res.json
    assert len(res.json["hits"]) == 1

    c.update_settings("nested2", {"filterableAttributes": ["cattos", "doggos.age"]})
    c.add_documents("nested2", NESTED_DOCUMENTS)
    res = c.post(
        "/indexes/nested2/search", body={"filter": "cattos = pésti"}
    )
    assert res.status == 200, res.json
    assert len(res.json["hits"]) == 1
    assert res.json["hits"][0]["id"] == 852

    res = c.post(
        "/indexes/nested2/search", body={"filter": "doggos.age > 5"}
    )
    assert res.status == 200, res.json
    assert len(res.json["hits"]) == 2
    assert [h["id"] for h in res.json["hits"]] == [654, 951]


def test_search_with_filter_array_notation(app):
    c = TestClient(app)
    c.update_settings("movies", {"filterableAttributes": ["title"]})
    c.add_documents("movies", DOCUMENTS)
    res = c.post(
        "/indexes/movies/search", body={"filter": ["title = Gläss"]}
    )
    assert res.status == 200, res.json
    assert len(res.json["hits"]) == 1

    res = c.post(
        "/indexes/movies/search",
        body={"filter": [["title = Gläss", "title = \"Shazam!\"", "title = \"Escape Room\""]]},
    )
    assert res.status == 200, res.json
    assert len(res.json["hits"]) == 3


def test_search_with_contains_filter(app):
    c = TestClient(app)
    c.patch("/experimental-features", body={"containsFilter": True})
    c.update_settings("movies", {"filterableAttributes": ["title"]})
    c.add_documents("movies", DOCUMENTS)
    res = c.post(
        "/indexes/movies/search", body={"filter": "title CONTAINS cap"}
    )
    assert res.status == 200, res.json
    assert len(res.json["hits"]) == 2


def test_pattern_filter_settings_equality(app):
    c = _nested(
        app,
        {"filterableAttributes": [{"attributePatterns": ["cattos", "doggos.age"]}]},
    )
    res = c.post("/indexes/nested/search", body={"filter": "cattos = pésti"})
    assert res.status == 200, res.json
    assert [h["id"] for h in res.json["hits"]] == [852]

    # explicit features: equality only
    c = _nested(
        app,
        {
            "filterableAttributes": [
                {
                    "attributePatterns": ["cattos", "doggos.age"],
                    "features": {
                        "facetSearch": False,
                        "filter": {"equality": True, "comparison": False},
                    },
                }
            ]
        },
    )
    res = c.post("/indexes/nested/search", body={"filter": "cattos = pésti"})
    assert res.status == 200, res.json
    assert [h["id"] for h in res.json["hits"]] == [852]


def test_pattern_filter_settings_comparison(app):
    c = _nested(
        app,
        {
            "filterableAttributes": [
                {
                    "attributePatterns": ["cattos", "doggos.age"],
                    "features": {
                        "facetSearch": False,
                        "filter": {"equality": False, "comparison": True},
                    },
                }
            ]
        },
    )
    res = c.post("/indexes/nested/search", body={"filter": "doggos.age > 2"})
    assert res.status == 200, res.json
    assert [h["id"] for h in res.json["hits"]] == [852, 654, 951]


def test_comparison_disabled_error_surface(app):
    # filters.rs:317 — the exact Note/Hint block
    c = _nested(
        app,
        {
            "filterableAttributes": [
                {
                    "attributePatterns": ["cattos", "doggos.age"],
                    "features": {
                        "facetSearch": False,
                        "filter": {"equality": True, "comparison": False},
                    },
                }
            ]
        },
    )
    res = c.post("/indexes/nested/search", body={"filter": "doggos.age > 2"})
    assert res.status == 400
    body = res.json
    assert body["code"] == "invalid_search_filter"
    assert body["type"] == "invalid_request"
    assert body["link"] == (
        "https://docs.meilisearch.com/errors#invalid_search_filter"
    )
    assert body["message"] == (
        "Index `nested`: Filter operator `>` is not allowed for the"
        " attribute `doggos.age`."
        "\n  - Note: allowed operators: OR, AND, NOT, =, !=, IN, IS EMPTY,"
        " IS NULL, EXISTS."
        "\n  - Note: field `doggos.age` matched rule #0 in"
        " `filterableAttributes`"
        "\n  - Hint: enable comparison in rule #0 by modifying the"
        " features.filter object"
        "\n  - Hint: prepend another rule matching `doggos.age` with"
        " appropriate filter features before rule #0"
    )


def test_equality_disabled_error_surface(app):
    # filters.rs:461 — the comparison-only allowed list
    c = _nested(
        app,
        {
            "filterableAttributes": [
                {
                    "attributePatterns": ["cattos", "doggos.age"],
                    "features": {
                        "facetSearch": False,
                        "filter": {"equality": False, "comparison": True},
                    },
                }
            ]
        },
    )
    res = c.post("/indexes/nested/search", body={"filter": "cattos = pésti"})
    assert res.status == 400
    assert res.json["message"] == (
        "Index `nested`: Filter operator `=` is not allowed for the"
        " attribute `cattos`."
        "\n  - Note: allowed operators: OR, AND, NOT, <, >, <=, >=, TO,"
        " IS EMPTY, IS NULL, EXISTS."
        "\n  - Note: field `cattos` matched rule #0 in"
        " `filterableAttributes`"
        "\n  - Hint: enable equality in rule #0 by modifying the"
        " features.filter object"
        "\n  - Hint: prepend another rule matching `cattos` with"
        " appropriate filter features before rule #0"
    )


def test_remove_comparison_feature_keeps_equality(app):
    c = TestClient(app)
    uid = "nested"
    c.update_settings(
        uid,
        {
            "filterableAttributes": [
                {
                    "attributePatterns": ["cattos"],
                    "features": {
                        "facetSearch": False,
                        "filter": {"equality": True, "comparison": True},
                    },
                }
            ]
        },
    )
    c.add_documents(uid, NESTED_DOCUMENTS)
    c.update_settings(
        uid,
        {
            "filterableAttributes": [
                {
                    "attributePatterns": ["cattos"],
                    "features": {
                        "facetSearch": False,
                        "filter": {"equality": True, "comparison": False},
                    },
                }
            ]
        },
    )
    res = c.post(f"/indexes/{uid}/search", body={"filter": "cattos = simba"})
    assert res.status == 200, res.json
    assert [h["id"] for h in res.json["hits"]] == [654]


PRIORITY_RULES = {
    "filterableAttributes": [
        {
            "attributePatterns": ["doggos.a*"],
            "features": {
                "facetSearch": False,
                "filter": {"equality": False, "comparison": False},
            },
        },
        {"attributePatterns": ["doggos.*"]},
    ]
}


def test_filterable_attributes_priority_name_filterable(app):
    # doggos.name misses the disabled rule, matches the enabled one
    c = _nested(app, PRIORITY_RULES)
    res = c.post(
        "/indexes/nested/search", body={"filter": "doggos.name = bobby"}
    )
    assert res.status == 200, res.json
    assert [h["id"] for h in res.json["hits"]] == [852]


def test_filterable_attributes_priority_age_not_filterable(app):
    # doggos.age hits the DISABLED rule first: NOT filterable, and the
    # available-patterns list excludes the disabled rule's patterns
    c = _nested(app, PRIORITY_RULES)
    res = c.post("/indexes/nested/search", body={"filter": "doggos.age > 2"})
    assert res.status == 400
    assert res.json["code"] == "invalid_search_filter"
    assert res.json["message"].startswith(
        "Index `nested`: Attribute `doggos.age` is not filterable."
        " Available filterable attribute patterns are: `doggos.*`."
    )


def test_filterable_attributes_priority_parent_disabled(app):
    c = _nested(
        app,
        {
            "filterableAttributes": [
                {
                    "attributePatterns": ["doggos"],
                    "features": {
                        "facetSearch": False,
                        "filter": {"equality": False, "comparison": False},
                    },
                },
                {"attributePatterns": ["doggos.*"]},
            ]
        },
    )
    res = c.post(
        "/indexes/nested/search", body={"filter": "doggos.name = bobby"}
    )
    assert res.status == 200, res.json
    assert [h["id"] for h in res.json["hits"]] == [852]

    res = c.post("/indexes/nested/search", body={"filter": "doggos EXISTS"})
    assert res.status == 400
    assert res.json["message"].startswith(
        "Index `nested`: Attribute `doggos` is not filterable."
        " Available filterable attribute patterns are: `doggos.*`."
    )
