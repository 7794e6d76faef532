"""Golden port of the reference facet-search HTTP suite
(crates/meilisearch/tests/search/facet_search.rs): same documents,
queries, and expected facetHits — typo tolerance inside facet values,
maxValuesPerFacet, sortFacetValuesBy count, multi-word values, the
non-filterable error, and the facetSearch=false gate."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

DOCUMENTS = [
    {"title": "Shazam!", "genres": ["Action", "Adventure"], "id": "287947"},
    {
        "title": "Captain Marvel",
        "genres": ["Action", "Adventure"],
        "id": "299537",
    },
    {
        "title": "Escape Room",
        "genres": ["Horror", "Thriller", "Multiple Words"],
        "id": "522681",
    },
    {
        "title": "How to Train Your Dragon: The Hidden World",
        "genres": ["Action", "Comedy"],
        "id": "166428",
    },
    {"title": "Gläss", "genres": ["Thriller"], "id": "450465"},
]


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def facet_search(client, body, index="movies"):
    return client.post(f"/indexes/{index}/facet-search", body=body)


def seed(client, settings=None):
    client.update_settings(
        "movies", {"filterableAttributes": ["genres"], **(settings or {})}
    )
    client.add_documents("movies", DOCUMENTS)


def test_simple_facet_search(client):
    seed(client)
    res = facet_search(client, {"facetName": "genres", "facetQuery": "a"})
    assert res.status == 200
    assert len(res.json["facetHits"]) == 2  # Action, Adventure
    res = facet_search(
        client, {"facetName": "genres", "facetQuery": "adventure"}
    )
    assert len(res.json["facetHits"]) == 1


def test_advanced_facet_search_typo_disabled(client):
    client.update_settings(
        "movies",
        {
            "filterableAttributes": ["genres"],
            "typoTolerance": {"enabled": False},
        },
    )
    client.add_documents("movies", DOCUMENTS)
    res = facet_search(
        client, {"facetName": "genres", "facetQuery": "adventre"}
    )
    assert len(res.json["facetHits"]) == 0
    res = facet_search(
        client, {"facetName": "genres", "facetQuery": "àdventure"}
    )
    assert len(res.json["facetHits"]) == 1


def test_more_advanced_facet_search_disable_on_words(client):
    client.update_settings(
        "movies",
        {
            "filterableAttributes": ["genres"],
            "typoTolerance": {"disableOnWords": ["adventre"]},
        },
    )
    client.add_documents("movies", DOCUMENTS)
    res = facet_search(
        client, {"facetName": "genres", "facetQuery": "adventre"}
    )
    assert len(res.json["facetHits"]) == 0
    res = facet_search(
        client, {"facetName": "genres", "facetQuery": "adventure"}
    )
    assert len(res.json["facetHits"]) == 1


def test_max_values_per_facet(client):
    seed(client, {"faceting": {"maxValuesPerFacet": 1}})
    res = facet_search(client, {"facetName": "genres", "facetQuery": "a"})
    assert len(res.json["facetHits"]) == 1


def test_max_values_by_count(client):
    seed(
        client,
        {
            "faceting": {
                "maxValuesPerFacet": 1,
                "sortFacetValuesBy": {"*": "count"},
            }
        },
    )
    res = facet_search(client, {"facetName": "genres", "facetQuery": "a"})
    assert len(res.json["facetHits"]) == 1


def test_non_filterable_facet_search_error(client):
    client.add_documents("movies", DOCUMENTS)
    res = facet_search(client, {"facetName": "genres", "facetQuery": "a"})
    assert res.status == 400
    res = facet_search(client, {"facetName": "genres", "facetQuery": "adv"})
    assert res.status == 400


def test_facet_search_dont_support_words(client):
    seed(client)
    # "words" only appears as the SECOND word of "Multiple Words": facet
    # search matches value prefixes, not inner words
    res = facet_search(client, {"facetName": "genres", "facetQuery": "words"})
    assert res.status == 200
    assert len(res.json["facetHits"]) == 0


def test_sort_by_count(client):
    seed(client, {"faceting": {"sortFacetValuesBy": {"*": "count"}}})
    res = facet_search(client, {"facetName": "genres", "facetQuery": "a"})
    hits = res.json["facetHits"]
    assert hits[0] == {"value": "Action", "count": 3}
    assert hits[1] == {"value": "Adventure", "count": 2}


def test_deactivated_facet_search(client):
    client.add_documents("movies", DOCUMENTS)
    client.update_settings(
        "movies", {"facetSearch": False, "filterableAttributes": ["genres"]}
    )
    res = facet_search(client, {"facetName": "genres", "facetQuery": "a"})
    assert res.status == 400
    assert res.json["code"] == "facet_search_disabled"
