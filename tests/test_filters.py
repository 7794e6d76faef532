"""Filter DSL tests — scenarios mirror the reference's filter behavior
(crates/milli/src/search/facet/filter/tests.rs and HTTP suite
crates/meilisearch/tests/search/filters.rs)."""

import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.filters import evaluate_filter, parse_filter, FilterError
from meilisearch_tpu.types.errors import EngineError


def make_store():
    store = IndexStore("movies")
    store.settings.apply_json(
        {"filterableAttributes": ["genre", "rating", "title", "_geo", "tags"]}
    )
    store.add_documents(
        [
            {"id": 0, "title": "Carol", "genre": ["Romance", "Drama"], "rating": 4.5,
             "_geo": {"lat": 45.0, "lng": 3.0}},
            {"id": 1, "title": "Wonder Woman", "genre": ["Action", "Adventure"], "rating": 3.2,
             "_geo": {"lat": 45.1, "lng": 3.1}},
            {"id": 2, "title": "Life of Pi", "genre": ["Adventure", "Drama"], "rating": 10},
            {"id": 3, "title": "Mad Max", "genre": [], "rating": None, "tags": ""},
            {"id": 4, "title": "Moana", "rating": "not-a-number"},
        ]
    )
    return store


def f(store, expr):
    return sorted(evaluate_filter(store, expr))


def test_equality():
    s = make_store()
    assert f(s, "genre = Romance") == [0]
    assert f(s, "genre = romance") == [0]  # case-insensitive normalization
    assert f(s, "genre = 'Adventure'") == [1, 2]
    assert f(s, 'genre = "Drama"') == [0, 2]
    assert f(s, "rating = 4.5") == [0]
    assert f(s, "rating = 10") == [2]


def test_inequality_is_complement():
    s = make_store()
    assert f(s, "genre != Drama") == [1, 3, 4]
    assert f(s, "NOT genre = Drama") == [1, 3, 4]


def test_comparison():
    s = make_store()
    # doc 4 has rating "not-a-number": string comparison applies to it
    # (reference value_bounds.rs: ranges cover numbers AND normalized strings)
    assert f(s, "rating > 4") == [0, 2, 4]
    assert f(s, "rating >= 3.2") == [0, 1, 2, 4]
    assert f(s, "rating < 4") == [1]
    assert f(s, "rating 3 TO 5") == [0, 1]
    # string comparison applies lexicographically on normalized values:
    # "mad max" > "mad", "moana" > "mad", "wonder woman" > "mad"
    assert f(s, "title > mad") == [1, 3, 4]
    assert 1 in f(s, "title > life")


def test_in():
    s = make_store()
    assert f(s, "genre IN [Romance, Action]") == [0, 1]
    assert f(s, "genre NOT IN [Romance, Action]") == [2, 3, 4]
    assert f(s, "genre IN []") == []


def test_exists_null_empty():
    s = make_store()
    assert f(s, "rating EXISTS") == [0, 1, 2, 3, 4]
    assert f(s, "rating NOT EXISTS") == []
    assert f(s, "rating IS NULL") == [3]
    assert f(s, "genre IS EMPTY") == [3]
    assert f(s, "tags IS EMPTY") == [3]
    assert f(s, "rating IS NOT NULL") == [0, 1, 2, 4]


def test_contains_starts_with():
    s = make_store()
    assert f(s, "title CONTAINS wonder") == [1]
    assert f(s, "title STARTS WITH li") == [2]
    assert f(s, "title NOT STARTS WITH li") == [0, 1, 3, 4]


def test_boolean_combinators():
    s = make_store()
    assert f(s, "genre = Drama AND rating > 5") == [2]
    assert f(s, "genre = Drama OR rating > 5") == [0, 2, 4]
    assert f(s, "(genre = Drama OR genre = Action) AND rating < 5") == [0, 1]
    assert f(s, "NOT (genre = Drama OR genre = Action)") == [3, 4]


def test_geo():
    s = make_store()
    assert f(s, "_geoRadius(45.0, 3.0, 1000)") == [0]
    assert f(s, "_geoRadius(45.05, 3.05, 100000)") == [0, 1]
    assert f(s, "_geoBoundingBox([45.05, 3.05], [44.95, 2.95])") == [0]


def test_array_form():
    s = make_store()
    assert f(s, ["genre = Drama", "rating > 5"]) == [2]
    assert f(s, [["genre = Drama", "genre = Action"], "rating < 5"]) == [0, 1]


def test_not_filterable_error():
    s = make_store()
    with pytest.raises(EngineError) as e:
        f(s, "unknown_field = 3")
    assert "not filterable" in str(e.value)


def test_parse_errors():
    with pytest.raises(FilterError):
        parse_filter("genre = ")
    with pytest.raises(FilterError):
        parse_filter("genre = Drama AND")
    with pytest.raises(FilterError):
        parse_filter("genre = Drama unexpected")
    with pytest.raises(FilterError):
        parse_filter("AND genre = Drama")
    with pytest.raises(FilterError):
        parse_filter("_geoPoint(12, 13) = 1")


def test_quoted_keywords():
    s = make_store()
    store = IndexStore("t")
    store.settings.apply_json({"filterableAttributes": ["AND"]})
    store.add_documents([{"id": 0, "AND": "x"}])
    assert sorted(evaluate_filter(store, "'AND' = x")) == [0]
