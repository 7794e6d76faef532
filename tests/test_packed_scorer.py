"""Differential test: the packed bit-field DP must order documents exactly
like the (D, N) matrix DP it replaces (scorer.py _run_packed vs
_run_with_threshold)."""

import numpy as np
import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.executor import Search

DOCS = [
    {"id": 0, "title": "the quick brown fox jumps over the lazy dog"},
    {"id": 1, "title": "quick brown foxes leap over lazy dogs"},
    {"id": 2, "title": "a quick movie about a brown fox"},
    {"id": 3, "title": "brown quick fox"},
    {"id": 4, "title": "the quack brwn fx"},
    {"id": 5, "title": "quick", "body": "brown fox elsewhere"},
    {"id": 6, "title": "totally unrelated words here"},
    {"id": 7, "title": "fox brown quick ordered backwards"},
    {"id": 8, "title": "the quick brown fox", "body": "exact match doc"},
    {"id": 9, "title": "quickly browsing foxy things"},
]

QUERIES = [
    "quick brown fox",
    "quik brown fox",
    '"quick brown" fox',
    "the quick brown fox jumps",
    "fox",
]


def _orders(store, strategy):
    out = []
    for q in QUERIES:
        res = Search(
            store, query=q, terms_matching_strategy=strategy, limit=30
        ).execute()
        out.append(list(res.documents_ids))
    return out


@pytest.mark.parametrize("strategy", ["last", "all", "frequency"])
def test_packed_matches_matrix_dp(monkeypatch, strategy):
    store = IndexStore("packed", primary_key="id")
    store.settings.apply_json(
        {"searchableAttributes": ["title", "body"]}
    )
    store.add_documents(DOCS)

    packed_orders = _orders(store, strategy)

    # force the matrix fallback
    from meilisearch_tpu.search import scorer as scorer_mod

    orig = scorer_mod.FusedScorer._prepare_packing

    def no_packing(self):
        orig(self)
        self._packed_ok = False

    monkeypatch.setattr(scorer_mod.FusedScorer, "_prepare_packing", no_packing)
    matrix_orders = _orders(store, strategy)

    assert packed_orders == matrix_orders


def test_packed_cost_matrix_identical(monkeypatch):
    """Not just the order: the unpacked cost matrix itself must match."""
    from meilisearch_tpu.search import scorer as scorer_mod

    store = IndexStore("packed2", primary_key="id")
    store.add_documents(DOCS)

    captured = {}
    orig_run = scorer_mod.FusedScorer.run_raw

    def capture_run(self):
        kind, data = orig_run(self)
        if kind == "packed":
            captured["packed"] = self._unpack(data)
        else:
            captured["matrix"] = data
        return kind, data

    monkeypatch.setattr(scorer_mod.FusedScorer, "run_raw", capture_run)
    Search(store, query="quick brown fox", limit=30).execute()

    orig_prep = scorer_mod.FusedScorer._prepare_packing

    def no_packing(self):
        orig_prep(self)
        self._packed_ok = False

    monkeypatch.setattr(
        scorer_mod.FusedScorer, "_prepare_packing", no_packing
    )
    Search(store, query="quick brown fox", limit=30).execute()

    assert "packed" in captured and "matrix" in captured
    np.testing.assert_array_equal(captured["packed"], captured["matrix"])
