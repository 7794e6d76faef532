"""Golden port of the reference facet-distribution tests
(crates/milli/src/search/facet/facet_distribution.rs:437 mod tests):
same documents, candidates, and snapshot outputs — pins normalization
folding (first-seen original wins), maxValuesPerFacet truncation in both
lexicographic and count order, and candidate restriction."""

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.facets import facet_distribution


def make_store(docs, filterable=("colour",)):
    s = IndexStore("facets", primary_key="id")
    s.settings.apply_json({"filterableAttributes": list(filterable)})
    s.add_documents(docs)
    return s


def dist(store, candidates=None, max_values=None, order=None):
    d, _stats = facet_distribution(
        store,
        ["colour"],
        candidates,
        max_values_per_facet=max_values,
        sort_facet_values_by={"colour": order} if order else None,
    )
    return d["colour"]


# -- few_candidates_few_facet_values (facet_distribution.rs:447) -------------

def test_few_candidates_few_facet_values():
    store = make_store(
        [
            {"id": 0, "colour": "Blue"},
            {"id": 1, "colour": "  blue"},
            {"id": 2, "colour": "RED"},
        ]
    )
    assert dist(store) == {"Blue": 2, "RED": 1}
    assert dist(store, {0, 1, 2}) == {"Blue": 2, "RED": 1}
    # reference: any non-normalized original is acceptable for the pair;
    # it returns the first-seen original ("  blue" in candidate order) —
    # we keep the first-seen-at-indexing original ("Blue"), which the
    # reference's own comment calls equally fine (rs:493-495)
    m = dist(store, {1, 2})
    assert m in ({"  blue": 1, "RED": 1}, {"Blue": 1, "RED": 1})
    assert dist(store, {2}) == {"RED": 1}
    assert dist(store, {0, 1, 2}, max_values=1) == {"Blue": 2}
    assert dist(store, {0, 1, 2}, max_values=1, order="count") == {"Blue": 2}


# -- many_candidates_few_facet_values (facet_distribution.rs:524) ------------

def test_many_candidates_few_facet_values():
    facet_values = ["Red", "RED", " red ", "Blue", "BLUE"]
    docs = [
        {"id": i, "colour": facet_values[i % 5]} for i in range(10_000)
    ]
    store = make_store(docs)
    assert dist(store) == {"Blue": 4000, "Red": 6000}
    assert dist(store, max_values=1) == {"Blue": 4000}
    assert dist(store, set(range(10_000))) == {"Blue": 4000, "Red": 6000}
    assert dist(store, set(range(5_000))) == {"Blue": 2000, "Red": 3000}
    assert dist(store, set(range(5_000)), max_values=1) == {"Blue": 2000}
    assert dist(store, set(range(5_000)), max_values=1, order="count") == {
        "Red": 3000
    }


# -- many_candidates_many_facet_values (facet_distribution.rs:612) -----------

def test_many_candidates_many_facet_values():
    facet_values = [format(x, "x") for x in range(1000)]
    docs = [
        {"id": i, "colour": facet_values[i % 1000]} for i in range(10_000)
    ]
    store = make_store(docs)
    full = dist(store, max_values=None)
    # default maxValuesPerFacet caps at 100 values
    assert len(full) == 100
    assert all(v == 10 for v in full.values())
    restricted = dist(store, set(range(5_000)))
    assert len(restricted) == 100
    assert all(v == 5 for v in restricted.values())
