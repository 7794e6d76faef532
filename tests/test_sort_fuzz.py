"""Randomized sort differentials: the dense SortColumns rows must order
exactly like the reference semantics — numbers (asc/desc) before strings
(lexicographic by normalized form) before docs without the field, stable
within ties by ranking then docid."""

import numpy as np
import pytest

from meilisearch_tpu.index.store import IndexStore, facet_string_normalize
from meilisearch_tpu.search.perform import perform_search

STRINGS = ["pear", "Apple", "fig", "zig", "date"]


def _store(seed):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(80):
        doc = {"id": i, "t": "hello"}
        roll = rng.random()
        if roll < 0.5:
            doc["v"] = float(rng.integers(-50, 50))
        elif roll < 0.8:
            doc["v"] = str(rng.choice(STRINGS))
        # else: no value
        docs.append(doc)
    store = IndexStore(f"sf{seed}", primary_key="id")
    store.settings.apply_json({"sortableAttributes": ["v"], "filterableAttributes": ["v"]})
    store.add_documents(docs)
    return store, docs


def _brute_order(docs, asc: bool):
    def key(doc):
        v = doc.get("v")
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return (0, v if asc else -v, "", doc["id"])
        if isinstance(v, str):
            norm = facet_string_normalize(v)
            return (1, 0.0, norm, doc["id"]) if asc else (1, 0.0, _desc_str(norm), doc["id"])
        return (2, 0.0, "", doc["id"])

    return [d["id"] for d in sorted(docs, key=key)]


def _desc_str(norm: str):
    # invert lexicographic order for desc while keeping a sortable key
    return tuple(-ord(c) for c in norm)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("asc", [True, False])
def test_sort_matches_brute_force(seed, asc):
    store, docs = _store(seed)
    direction = "asc" if asc else "desc"
    res = perform_search(
        store, {"q": "", "sort": [f"v:{direction}"], "limit": 100}
    )
    got = [h["id"] for h in res["hits"]]
    assert got == _brute_order(docs, asc), f"seed {seed} {direction}"
