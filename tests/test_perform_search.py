"""Search façade tests: response shape, formatting, facets, pagination.
Scenarios mirror reference HTTP tests (crates/meilisearch/tests/search/)."""

import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import perform_search, perform_facet_search
from meilisearch_tpu.types.errors import EngineError

DOCS = [
    {"id": 287947, "title": "Shazam!", "genre": ["Action", "Comedy"], "rating": 4},
    {"id": 299537, "title": "Captain Marvel", "genre": ["Action"], "rating": 5},
    {"id": 166428, "title": "How to Train Your Dragon: The Hidden World",
     "genre": ["Animation"], "rating": 4},
    {"id": 450465, "title": "Glass", "genre": ["Thriller"], "rating": 3},
    {"id": 522681, "title": "Escape Room", "genre": ["Horror", "Thriller"], "rating": 2},
]


def make_store():
    store = IndexStore("movies", primary_key="id")
    store.settings.apply_json({"filterableAttributes": ["genre", "rating"]})
    store.add_documents(DOCS)
    return store


def test_basic_search_response():
    store = make_store()
    res = perform_search(store, {"q": "glass"})
    assert res["query"] == "glass"
    assert res["limit"] == 20
    assert res["offset"] == 0
    assert res["estimatedTotalHits"] == 1
    assert res["hits"][0]["title"] == "Glass"
    assert "processingTimeMs" in res


def test_typo_search():
    store = make_store()
    res = perform_search(store, {"q": "shazam"})
    assert [h["title"] for h in res["hits"]] == ["Shazam!"]
    res = perform_search(store, {"q": "shazan"})  # one typo
    assert [h["title"] for h in res["hits"]] == ["Shazam!"]


def test_prefix_search():
    store = make_store()
    res = perform_search(store, {"q": "capt"})
    assert [h["title"] for h in res["hits"]] == ["Captain Marvel"]


def test_placeholder_search():
    store = make_store()
    res = perform_search(store, {})
    assert len(res["hits"]) == 5
    assert res["estimatedTotalHits"] == 5


def test_filter_and_facets():
    store = make_store()
    res = perform_search(
        store, {"q": "", "filter": "genre = Thriller", "facets": ["genre", "rating"]}
    )
    assert res["estimatedTotalHits"] == 2
    assert res["facetDistribution"]["genre"] == {"Horror": 1, "Thriller": 2}
    assert res["facetStats"]["rating"] == {"min": 2.0, "max": 3.0}


def test_pagination_finite():
    store = make_store()
    res = perform_search(store, {"page": 1, "hitsPerPage": 2})
    assert res["page"] == 1
    assert res["hitsPerPage"] == 2
    assert res["totalHits"] == 5
    assert res["totalPages"] == 3
    assert len(res["hits"]) == 2
    res2 = perform_search(store, {"page": 3, "hitsPerPage": 2})
    assert len(res2["hits"]) == 1


def test_attributes_to_retrieve():
    store = make_store()
    res = perform_search(store, {"q": "glass", "attributesToRetrieve": ["title"]})
    assert res["hits"][0] == {"title": "Glass"}


def test_highlight():
    store = make_store()
    res = perform_search(
        store,
        {"q": "dragon", "attributesToHighlight": ["title"]},
    )
    hit = res["hits"][0]
    assert hit["_formatted"]["title"] == (
        "How to Train Your <em>Dragon</em>: The Hidden World"
    )


def test_highlight_prefix_partial():
    store = make_store()
    res = perform_search(
        store,
        {"q": "drag", "attributesToHighlight": ["title"]},
    )
    hit = res["hits"][0]
    # prefix matches highlight only the typed prefix
    assert hit["_formatted"]["title"] == (
        "How to Train Your <em>Drag</em>on: The Hidden World"
    )


def test_crop():
    store = make_store()
    res = perform_search(
        store,
        {"q": "dragon", "attributesToCrop": ["title"], "cropLength": 3},
    )
    hit = res["hits"][0]
    formatted = hit["_formatted"]["title"]
    assert "Dragon" in formatted
    assert formatted.startswith("…") or formatted.endswith("…")


def test_matches_position():
    store = make_store()
    res = perform_search(
        store,
        {"q": "dragon", "showMatchesPosition": True},
    )
    hit = res["hits"][0]
    positions = hit["_matchesPosition"]["title"]
    assert positions == [{"start": 18, "length": 6}]


def test_sort_requires_sortable():
    store = make_store()
    with pytest.raises(EngineError):
        perform_search(store, {"q": "", "sort": ["rating:asc"]})


def test_facet_search():
    store = make_store()
    store.settings.apply_json({"filterableAttributes": ["genre", "rating"]})
    res = perform_facet_search(store, {"facetName": "genre", "facetQuery": "a"})
    values = [h["value"] for h in res["facetHits"]]
    assert values == ["Action", "Animation"]
    assert res["facetHits"][0]["count"] == 2

    res = perform_facet_search(store, {"facetName": "genre"})
    assert len(res["facetHits"]) == 5

    # with typo
    res = perform_facet_search(store, {"facetName": "genre", "facetQuery": "citon"})
    assert [h["value"] for h in res["facetHits"]] == []
    res = perform_facet_search(store, {"facetName": "genre", "facetQuery": "actoin"})
    assert [h["value"] for h in res["facetHits"]] == ["Action"]


def test_negative_query():
    store = make_store()
    res = perform_search(store, {"q": "-escape room"})
    assert [h["title"] for h in res["hits"]] == []
    res = perform_search(store, {"q": "room -escape"})
    assert res["hits"] == []


def test_phrase_query():
    store = make_store()
    res = perform_search(store, {"q": '"Captain Marvel"'})
    assert [h["title"] for h in res["hits"]] == ["Captain Marvel"]
