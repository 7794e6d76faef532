"""_geojson shape filtering (cellulite equivalent).

Reference semantics (facet/filter/index_filter.rs:495-715):
- _geoRadius / _geoBoundingBox: union of `_geo` point matches and
  `_geojson` shape matches;
- _geoPolygon: `_geojson` shapes only, requires `_geojson` filterable.
"""

import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.filters import evaluate_filter
from meilisearch_tpu.types.errors import EngineError


def _store(filterable):
    store = IndexStore("geo", primary_key="id")
    store.settings.apply_json({"filterableAttributes": filterable})
    store.add_documents(
        [
            {"id": 0, "_geo": {"lat": 48.85, "lng": 2.35}},  # Paris point
            {
                "id": 1,
                "_geojson": {"type": "Point", "coordinates": [2.35, 48.86]},
            },
            {
                # square polygon around (10, 10)
                "id": 2,
                "_geojson": {
                    "type": "Polygon",
                    "coordinates": [
                        [[9.0, 9.0], [11.0, 9.0], [11.0, 11.0], [9.0, 11.0], [9.0, 9.0]]
                    ],
                },
            },
            {
                "id": 3,
                "_geojson": {
                    "type": "LineString",
                    "coordinates": [[20.0, 20.0], [21.0, 21.0]],
                },
            },
            {"id": 4, "_geo": {"lat": -48.0, "lng": -2.0}},
        ]
    )
    return store


def test_radius_unions_points_and_shapes():
    store = _store(["_geo", "_geojson"])
    got = sorted(evaluate_filter(store, "_geoRadius(48.855, 2.35, 5000)"))
    assert got == [0, 1]


def test_radius_shapes_only_when_geo_not_filterable():
    store = _store(["_geojson"])
    got = sorted(evaluate_filter(store, "_geoRadius(48.855, 2.35, 5000)"))
    assert got == [1]


def test_radius_neither_filterable_errors():
    store = _store(["other"])
    with pytest.raises(EngineError) as err:
        evaluate_filter(store, "_geoRadius(48.855, 2.35, 5000)")
    assert "_geo/_geojson" in str(err.value)


def test_bounding_box_with_shapes():
    store = _store(["_geo", "_geojson"])
    # box covering the polygon around (10, 10) and nothing else
    got = sorted(
        evaluate_filter(store, "_geoBoundingBox([12, 12], [8, 8])")
    )
    assert got == [2]


def test_polygon_matches_shapes_only():
    store = _store(["_geo", "_geojson"])
    # triangle around Paris: matches the geojson point but NOT the _geo
    # point doc (reference: GeoPolygon queries cellulite only)
    got = sorted(
        evaluate_filter(
            store, "_geoPolygon([49, 1], [49, 3], [48, 2.3])"
        )
    )
    assert got == [1]


def test_polygon_requires_geojson_filterable():
    store = _store(["_geo"])
    with pytest.raises(EngineError) as err:
        evaluate_filter(store, "_geoPolygon([49, 1], [49, 3], [48, 2.3])")
    assert "_geojson" in str(err.value)


def test_polygon_intersecting_shape_polygon():
    store = _store(["_geojson"])
    # query polygon overlapping the corner of doc 2's square
    got = sorted(
        evaluate_filter(
            store, "_geoPolygon([10.5, 10.5], [10.5, 12], [12, 12], [12, 10.5])"
        )
    )
    assert got == [2]


def test_line_shape_in_radius():
    store = _store(["_geojson"])
    got = sorted(evaluate_filter(store, "_geoRadius(20.5, 20.5, 100000)"))
    assert got == [3]


def test_shape_deleted_with_document():
    store = _store(["_geojson"])
    store.delete_documents(["2"])
    got = sorted(
        evaluate_filter(
            store, "_geoPolygon([9.5, 9.5], [9.5, 12], [12, 12], [12, 9.5])"
        )
    )
    assert got == []
