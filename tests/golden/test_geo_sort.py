"""Port of reference tests/geo_sort.rs."""

from .common import build_index, search_ids

CRIT = dict(
    criteria=["words", "sort"],
    sortableAttributes=["_geo", "score"],
)


def test_geo_sort():
    docs = [
        {"id": 2, "_geo": {"lat": 2, "lng": -1}},
        {"id": 3, "_geo": {"lat": -2, "lng": -2}},
        {"id": 5, "_geo": {"lat": 6, "lng": -5}},
        {"id": 4, "_geo": {"lat": 3, "lng": 5}},
        {"id": 0, "_geo": {"lat": 0, "lng": 0}},
        {"id": 1, "_geo": {"lat": 1, "lng": 1}},
        {"id": 6}, {"id": 8}, {"id": 7}, {"id": 10}, {"id": 9},
    ]
    index = build_index(docs, **CRIT)

    def ext(ids):
        return [int(index.internal_to_external[d]) for d in ids]

    ids = ext(search_ids(index, None, sort_criteria=["_geoPoint(0, 0):asc"]))
    assert ids == [0, 1, 2, 3, 4, 5, 6, 8, 7, 10, 9]
    ids = ext(search_ids(index, None, sort_criteria=["_geoPoint(0, 0):desc"]))
    assert ids == [5, 4, 3, 2, 1, 0, 6, 8, 7, 10, 9]


GEO_SCORE_DOCS = [
    {"id": 1}, {"id": 4}, {"id": 3}, {"id": 2}, {"id": 5},
    {"id": 6, "_geo": {"lat": 2, "lng": 2}, "score": 10},
    {"id": 7, "_geo": {"lat": 2, "lng": 2}, "score": 9},
    {"id": 8, "_geo": {"lat": 2, "lng": 2}, "score": 8},
    {"id": 9, "_geo": {"lat": 2, "lng": 2}, "score": 7},
    {"id": 10, "_geo": {"lat": 2, "lng": 2}, "score": 6},
    {"id": 11, "_geo": {"lat": 2, "lng": 2}, "score": 5},
    {"id": 12, "_geo": {"lat": 5, "lng": 5}, "score": 10},
    {"id": 13, "_geo": {"lat": 5, "lng": 5}, "score": 9},
    {"id": 14, "_geo": {"lat": 5, "lng": 5}, "score": 8},
    {"id": 15, "_geo": {"lat": 5, "lng": 5}, "score": 7},
]


def test_geo_sort_with_following_ranking_rules():
    index = build_index(GEO_SCORE_DOCS, **CRIT)

    def ext(ids):
        return [int(index.internal_to_external[d]) for d in ids]

    ids = ext(
        search_ids(
            index, None,
            sort_criteria=["_geoPoint(0, 0):asc", "score:desc"],
        )
    )
    assert ids == [6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 1, 4, 3, 2, 5]

    ids = ext(
        search_ids(
            index, None,
            sort_criteria=["_geoPoint(0, 0):desc", "score:desc"],
        )
    )
    assert ids == [12, 13, 14, 15, 6, 7, 8, 9, 10, 11, 1, 4, 3, 2, 5]


def test_geo_sort_around_the_edge_of_the_flat_earth():
    docs = [
        {"id": 0, "_geo": {"lat": 0, "lng": 0}},
        {"id": 1, "_geo": {"lat": 88, "lng": 0}},
        {"id": 2, "_geo": {"lat": -89, "lng": 0}},
        {"id": 3, "_geo": {"lat": 0, "lng": 178}},
        {"id": 4, "_geo": {"lat": 0, "lng": -179}},
    ]
    index = build_index(docs, **CRIT)

    def ids_for(crit):
        return search_ids(index, None, sort_criteria=[crit])

    assert ids_for("_geoPoint(0, 0):asc") == [0, 1, 2, 3, 4]
    assert ids_for("_geoPoint(85, 0):asc") == [1, 0, 3, 4, 2]
    assert ids_for("_geoPoint(-85, 0):asc") == [2, 0, 3, 4, 1]
    assert ids_for("_geoPoint(0, 175):asc") == [3, 4, 2, 1, 0]
    assert ids_for("_geoPoint(0, -175):asc") == [4, 3, 2, 1, 0]
    assert ids_for("_geoPoint(0, 0):desc") == [4, 3, 2, 1, 0]
