"""Golden port of the reference distinct HTTP suite
(crates/meilisearch/tests/search/distinct.rs): distinct + offset
estimatedTotalHits decay (issue 4078), distinct + exhaustive pagination
(issue 4130), and query-time `distinct` on a nested field."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

DOCS = [
    {"id": 1, "description": "Leather Jacket", "brand": "Lee Jeans", "product_id": "123456", "color": "Brown"},
    {"id": 2, "description": "Leather Jacket", "brand": "Lee Jeans", "product_id": "123456", "color": "Black"},
    {"id": 3, "description": "Leather Jacket", "brand": "Lee Jeans", "product_id": "123456", "color": "Blue"},
    {"id": 4, "description": "T-Shirt", "brand": "Nike", "product_id": "789012", "color": "Red"},
    {"id": 5, "description": "T-Shirt", "brand": "Nike", "product_id": "789012", "color": "Blue"},
    {"id": 6, "description": "Running Shoes", "brand": "Adidas", "product_id": "456789", "color": "Black"},
    {"id": 7, "description": "Running Shoes", "brand": "Adidas", "product_id": "456789", "color": "White"},
    {"id": 8, "description": "Hoodie", "brand": "Puma", "product_id": "987654", "color": "Gray"},
    {"id": 9, "description": "Sweater", "brand": "Gap", "product_id": "234567", "color": "Green"},
    {"id": 10, "description": "Sweater", "brand": "Gap", "product_id": "234567", "color": "Red"},
    {"id": 11, "description": "Sweater", "brand": "Gap", "product_id": "234567", "color": "Blue"},
    {"id": 12, "description": "Jeans", "brand": "Levi's", "product_id": "345678", "color": "Indigo"},
    {"id": 13, "description": "Jeans", "brand": "Levi's", "product_id": "345678", "color": "Black"},
    {"id": 14, "description": "Jeans", "brand": "Levi's", "product_id": "345678", "color": "Stone Wash"},
]

NESTED = [
    {"id": 1, "description": "Leather Jacket", "brand": "Lee Jeans", "product_id": "123456", "color": {"main": "Brown", "pattern": "stripped"}},
    {"id": 2, "description": "Leather Jacket", "brand": "Lee Jeans", "product_id": "123456", "color": {"main": "Black", "pattern": "stripped"}},
    {"id": 3, "description": "Leather Jacket", "brand": "Lee Jeans", "product_id": "123456", "color": {"main": "Blue", "pattern": "used"}},
    {"id": 4, "description": "T-Shirt", "brand": "Nike", "product_id": "789012", "color": {"main": "Blue", "pattern": "stripped"}},
]


@pytest.fixture(scope="module")
def client():
    app = App()
    c = TestClient(app)
    c.update_settings("p", {"distinctAttribute": "product_id"})
    c.add_documents("p", DOCS, primary_key="id")
    yield c
    app.scheduler.stop()


def hits_pids(res):
    return [h["product_id"] for h in res.json["hits"]]


@pytest.mark.parametrize(
    "offset,expected,total",
    [
        (0, ["123456", "789012"], 11),
        (2, ["456789", "987654"], 10),
        (4, ["234567", "345678"], 6),
        (5, ["345678"], 6),
        (6, [], 6),
        (7, [], 6),
    ],
)
def test_distinct_offset_estimated_totals(client, offset, expected, total):
    res = client.search("p", {"offset": offset, "limit": 2})
    assert res.status == 200
    assert hits_pids(res) == expected
    assert res.json["estimatedTotalHits"] == total


@pytest.mark.parametrize(
    "page,hpp,expected,total_pages",
    [
        (0, 2, [], 3),
        (1, 2, ["123456", "789012"], 3),
        (2, 2, ["456789", "987654"], 3),
        (3, 2, ["234567", "345678"], 3),
        (4, 2, [], 3),
        (2, 3, ["987654", "234567", "345678"], 2),
    ],
)
def test_distinct_pagination_totals(client, page, hpp, expected, total_pages):
    res = client.search("p", {"page": page, "hitsPerPage": hpp})
    assert res.status == 200
    assert hits_pids(res) == expected
    assert res.json["page"] == page
    assert res.json["totalPages"] == total_pages
    assert res.json["totalHits"] == 6


def test_distinct_at_search_time():
    app = App()
    c = TestClient(app)
    c.update_settings("n", {"filterableAttributes": ["color.main"]})
    c.add_documents("n", NESTED, primary_key="id")
    res = c.search("n", {"page": 1, "hitsPerPage": 3, "distinct": "color.main"})
    assert res.status == 200
    assert [h["id"] for h in res.json["hits"]] == [1, 2, 3]
    assert res.json["page"] == 1
    assert res.json["totalPages"] == 1
    assert res.json["totalHits"] == 3
    app.scheduler.stop()
