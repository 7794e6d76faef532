"""Crash-robustness fuzz: garbage filter expressions and query strings must
produce clean EngineErrors or valid responses, never raw exceptions.
(Compact in-suite version of the offline 3000/2000-iteration campaigns.)"""

import numpy as np

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.filters import evaluate_filter
from meilisearch_tpu.search.perform import perform_search
from meilisearch_tpu.types.errors import EngineError

FILTER_TOKENS = [
    "n", "tag", ">", "<", "=", "!=", ">=", "<=", "TO", "AND", "OR", "NOT",
    "(", ")", "[", "]", ",", "'", '"', "IN", "EXISTS", "IS", "NULL", "EMPTY",
    "CONTAINS", "STARTS", "WITH", "5", "-3", "abc", "_geoRadius",
    "_geoPolygon", "1.5", "", " ", "\\", "é", "🎉",
]

QUERY_PIECES = [
    '"', "'", "-", "--", "  ", "\t", "\n", "\\", "((", "🎉", "é", "ß",
    "中文字", "word1", "hello", "a" * 300, "\x00", '"unclosed',
    '-"neg phrase', "𝔘𝔫𝔦",
]


def _store():
    store = IndexStore("rf", primary_key="id")
    store.settings.apply_json(
        {"filterableAttributes": ["n", "tag", "_geo", "_geojson"]}
    )
    store.add_documents(
        [{"id": i, "t": f"word{i} hello", "n": i, "tag": "x"} for i in range(30)]
    )
    return store


def test_filter_parser_never_crashes():
    store = _store()
    rng = np.random.default_rng(3)
    for _ in range(250):
        n = int(rng.integers(1, 12))
        expr = " ".join(str(rng.choice(FILTER_TOKENS)) for _ in range(n))
        try:
            evaluate_filter(store, expr)
        except EngineError:
            pass  # clean API error is the contract


def test_filter_depth_bomb_clean_error():
    store = _store()
    try:
        evaluate_filter(store, "(" * 500 + "n = 5" + ")" * 500)
    except EngineError as err:
        assert "depth" in str(err).lower()


def test_query_pipeline_never_crashes():
    store = _store()
    rng = np.random.default_rng(9)
    for _ in range(150):
        n = int(rng.integers(1, 8))
        q = "".join(
            str(rng.choice(QUERY_PIECES)) + (" " if rng.random() < 0.5 else "")
            for _ in range(n)
        )
        body = {"q": q}
        if rng.random() < 0.3:
            body["attributesToHighlight"] = ["t"]
            body["attributesToCrop"] = ["t"]
            body["showMatchesPosition"] = True
        try:
            perform_search(store, body)
        except EngineError:
            pass


def test_very_long_query_ok():
    store = _store()
    res = perform_search(store, {"q": "hello " * 2000})
    assert res["estimatedTotalHits"] >= 1
