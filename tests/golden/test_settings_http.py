"""Golden port of the reference settings suite
(crates/meilisearch/tests/settings/get_settings.rs): default payloads for
every setting and sub-route, partial updates, resets, secret masking, and
the pinned error messages."""

import pytest

from meilisearch_tpu.api.app import App, TestClient


@pytest.fixture()
def client():
    app = App()
    c = TestClient(app)
    yield c
    app.scheduler.stop()


def create_index(c, uid):
    res = c.post("/indexes", body={"uid": uid})
    assert res.status == 202, res.json
    c.wait_for_task(res.json["taskUid"])


DEFAULT_TEMPLATE = (
    "{% for field in fields %}"
    "{% if field.is_searchable and field.value != nil %}"
    "{{ field.name }}: {{ field.value }}\n"
    "{% endif %}{% endfor %}"
)

# sub-route → (update verb, default value) — the test_setting_routes! macro
# table (get_settings.rs:86-200)
SETTING_ROUTES = {
    "filterable-attributes": ("put", []),
    "displayed-attributes": ("put", ["*"]),
    "localized-attributes": ("put", None),
    "searchable-attributes": ("put", ["*"]),
    "distinct-attribute": ("put", None),
    "stop-words": ("put", []),
    "separator-tokens": ("put", []),
    "non-separator-tokens": ("put", []),
    "dictionary": ("put", []),
    "ranking-rules": (
        "put",
        ["words", "typo", "proximity", "attributeRank", "sort",
         "wordPosition", "exactness"],
    ),
    "synonyms": ("put", {}),
    "pagination": ("patch", {"maxTotalHits": 1000}),
    "faceting": (
        "patch",
        {"maxValuesPerFacet": 100, "sortFacetValuesBy": {"*": "alpha"}},
    ),
    "search-cutoff-ms": ("put", None),
    "embedders": ("patch", {}),
    "facet-search": ("put", True),
    "prefix-search": ("put", "indexingTime"),
    "proximity-precision": ("put", "byWord"),
    "sortable-attributes": ("put", []),
    "typo-tolerance": (
        "patch",
        {
            "enabled": True,
            "minWordSizeForTypos": {"oneTypo": 5, "twoTypos": 9},
            "disableOnWords": [],
            "disableOnAttributes": [],
            "disableOnNumbers": False,
        },
    ),
    "chat": (
        "patch",
        {
            "description": "",
            "documentTemplate": DEFAULT_TEMPLATE,
            "documentTemplateMaxBytes": 400,
            "searchParameters": {},
        },
    ),
    "foreign-keys": ("put", []),
}


def test_get_settings_defaults(client):
    create_index(client, "t")
    res = client.get("/indexes/t/settings")
    assert res.status == 200
    s = res.json
    assert len(s.keys()) == 20
    assert s["displayedAttributes"] == ["*"]
    assert s["searchableAttributes"] == ["*"]
    assert s["filterableAttributes"] == []
    assert s["sortableAttributes"] == []
    assert s["distinctAttribute"] is None
    assert s["rankingRules"] == [
        "words", "typo", "proximity", "attributeRank", "sort",
        "wordPosition", "exactness",
    ]
    assert s["stopWords"] == []
    assert s["nonSeparatorTokens"] == []
    assert s["separatorTokens"] == []
    assert s["dictionary"] == []
    assert s["faceting"] == {
        "maxValuesPerFacet": 100,
        "sortFacetValuesBy": {"*": "alpha"},
    }
    assert s["pagination"] == {"maxTotalHits": 1000}
    assert s["proximityPrecision"] == "byWord"
    assert s["searchCutoffMs"] is None
    assert s["prefixSearch"] == "indexingTime"
    assert s["facetSearch"] is True
    assert s["embedders"] == {}
    assert s["synonyms"] == {}
    assert s["typoTolerance"] == {
        "enabled": True,
        "minWordSizeForTypos": {"oneTypo": 5, "twoTypos": 9},
        "disableOnWords": [],
        "disableOnAttributes": [],
        "disableOnNumbers": False,
    }


def test_get_settings_unexisting_index(client):
    assert client.get("/indexes/nope/settings").status == 404


@pytest.mark.parametrize("route", sorted(SETTING_ROUTES))
def test_sub_route_defaults_and_unexisting(client, route):
    verb, default = SETTING_ROUTES[route]
    # GET on an unexisting index: 404
    assert client.get(f"/indexes/missing-idx/settings/{route}").status == 404
    # update/delete on an unexisting index are still accepted as tasks
    res = getattr(client, verb)(f"/indexes/missing-idx2/settings/{route}",
                                body=None)
    assert res.status == 202, (route, res.json)
    res = client.delete(f"/indexes/missing-idx3/settings/{route}")
    assert res.status == 202, (route, res.json)
    # defaults
    create_index(client, "sub")
    res = client.get(f"/indexes/sub/settings/{route}")
    assert res.status == 200, (route, res.json)
    assert res.json == default, route


def test_secrets_are_hidden_in_settings(client):
    create_index(client, "sec")
    res = client.patch(
        "/indexes/sec/settings",
        body={
            "embedders": {
                "default": {
                    "source": "rest",
                    "url": "https://localhost:7777",
                    "apiKey": "My super secret value you will never guess",
                    "dimensions": 4,
                    "request": "{{text}}",
                    "response": "{{embedding}}",
                }
            }
        },
    )
    assert res.status == 202, res.json
    uid = res.json["taskUid"]
    client.wait_for_task(uid)

    res = client.get("/indexes/sec/settings")
    assert res.status == 200
    emb = res.json["embedders"]["default"]
    assert emb == {
        "source": "rest",
        "apiKey": "My suXXXXXX...",
        "dimensions": 4,
        "documentTemplate": DEFAULT_TEMPLATE,
        "documentTemplateMaxBytes": 400,
        "url": "https://localhost:7777",
        "request": "{{text}}",
        "response": "{{embedding}}",
        "headers": {},
    }

    # task details mask the key too and show only the user's delta
    task = client.get(f"/tasks/{uid}").json
    det = task["details"]["embedders"]["default"]
    assert det["apiKey"] == "My suXXXXXX..."
    assert "documentTemplate" not in det


def test_error_update_settings_unknown_field(client):
    res = client.patch("/indexes/x/settings", body={"foo": 12})
    assert res.status == 400


def test_partial_update(client):
    client.update_settings("part", {"displayedAttributes": ["foo"]})
    s = client.get("/indexes/part/settings").json
    assert s["displayedAttributes"] == ["foo"]
    assert s["searchableAttributes"] == ["*"]
    client.update_settings("part", {"searchableAttributes": ["bar"]})
    s = client.get("/indexes/part/settings").json
    assert s["displayedAttributes"] == ["foo"]
    assert s["searchableAttributes"] == ["bar"]


def test_error_delete_settings_unexisting_index(client):
    res = client.delete("/indexes/ghost/settings")
    assert res.status == 202
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "failed"


def test_reset_all_settings(client):
    client.add_documents("rst", [{"id": 1, "name": "curqui", "age": 99}])
    client.update_settings(
        "rst",
        {
            "displayedAttributes": ["name", "age"],
            "searchableAttributes": ["name"],
            "stopWords": ["the"],
            "filterableAttributes": ["age"],
            "synonyms": {"puppy": ["dog", "doggo", "potat"]},
            "typoTolerance": {"disableOnNumbers": True},
        },
    )
    s = client.get("/indexes/rst/settings").json
    assert s["displayedAttributes"] == ["name", "age"]
    assert s["searchableAttributes"] == ["name"]
    assert s["stopWords"] == ["the"]
    assert s["synonyms"] == {"puppy": ["dog", "doggo", "potat"]}
    assert s["filterableAttributes"] == ["age"]
    assert s["typoTolerance"]["disableOnNumbers"] is True

    res = client.delete("/indexes/rst/settings")
    assert res.status == 202
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded", task

    s = client.get("/indexes/rst/settings").json
    assert s["displayedAttributes"] == ["*"]
    assert s["searchableAttributes"] == ["*"]
    assert s["stopWords"] == []
    assert s["filterableAttributes"] == []
    assert s["synonyms"] == {}
    assert s["typoTolerance"]["disableOnNumbers"] is False

    res = client.get("/indexes/rst/documents/1")
    assert res.status == 200
    assert "age" in res.json


def test_update_setting_unexisting_index_creates_it(client):
    res = client.patch("/indexes/fresh/settings", body={})
    assert res.status == 202
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    assert client.get("/indexes/fresh").status == 200


def test_error_update_setting_invalid_uid(client):
    res = client.patch("/indexes/test##!%20%20/settings", body={})
    assert res.status == 400
    assert res.json["code"] == "invalid_index_uid"
    assert res.json["type"] == "invalid_request"
    assert res.json["link"] == (
        "https://docs.meilisearch.com/errors#invalid_index_uid"
    )


def test_error_set_invalid_ranking_rules(client):
    create_index(client, "rr")
    res = client.patch(
        "/indexes/rr/settings", body={"rankingRules": ["manyTheFish"]}
    )
    assert res.status == 400, res.json
    assert res.json == {
        "message": "Invalid value at `.rankingRules[0]`: `manyTheFish`"
        " ranking rule is invalid. Valid ranking rules are words, typo,"
        " sort, proximity, attribute, exactness and custom ranking rules.",
        "code": "invalid_settings_ranking_rules",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors"
        "#invalid_settings_ranking_rules",
    }


def test_set_and_reset_distinct_attribute_with_dedicated_route(client):
    create_index(client, "dst")
    res = client.put("/indexes/dst/settings/distinct-attribute", body="test")
    assert res.status == 202, res.json
    client.wait_for_task(res.json["taskUid"])
    assert client.get("/indexes/dst/settings/distinct-attribute").json == "test"
    res = client.put("/indexes/dst/settings/distinct-attribute", body=None)
    assert res.status == 202
    client.wait_for_task(res.json["taskUid"])
    assert client.get("/indexes/dst/settings/distinct-attribute").json is None


def test_searchable_attributes_order(client):
    client.update_settings("ord", {"searchableAttributes": ["title", "overview"]})
    client.add_documents(
        "ord",
        [
            {"id": 1, "title": "The Matrix", "overview": "A computer hacker"},
            {"id": 2, "title": "Inception", "overview": "A thief"},
        ],
    )
    client.update_settings("ord", {"searchableAttributes": ["overview", "title"]})
    s = client.get("/indexes/ord/settings").json
    assert s["searchableAttributes"] == ["overview", "title"]
    client.update_settings("ord", {"searchableAttributes": ["title", "overview"]})
    s = client.get("/indexes/ord/settings").json
    assert s["searchableAttributes"] == ["title", "overview"]
