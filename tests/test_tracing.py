"""Tracing spans, profile totals, /logs/stream, explain-query."""

import json

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.logger import explain_query
from meilisearch_tpu.search.perform import perform_search
from meilisearch_tpu.utils import tracing


def _store():
    store = IndexStore("t", primary_key="id")
    store.add_documents(
        [{"id": 1, "t": "quick brown fox"}, {"id": 2, "t": "lazy dog"}]
    )
    return store


def test_spans_emitted_to_subscriber():
    store = _store()
    sub = tracing.subscribe()
    try:
        perform_search(store, {"q": "quick"})
        lines = []
        while not sub.empty():
            lines.append(json.loads(sub.get_nowait()))
    finally:
        tracing.unsubscribe(sub)
    targets = {l["target"] for l in lines}
    assert "search::universe" in targets
    assert "search::query" in targets
    assert all("durationMs" in l for l in lines)


def test_target_filter():
    store = _store()
    sub = tracing.subscribe("indexing::")
    try:
        perform_search(store, {"q": "quick"})
        store.add_documents([{"id": 3, "t": "new doc"}])
        targets = set()
        while not sub.empty():
            targets.add(json.loads(sub.get_nowait())["target"])
    finally:
        tracing.unsubscribe(sub)
    assert targets == {"indexing::documents"}


def test_profile_totals():
    store = _store()
    tracing.set_collect_totals(True)
    try:
        perform_search(store, {"q": "quick"})
        perform_search(store, {"q": "dog"})
        totals = tracing.profile_totals()
    finally:
        tracing.set_collect_totals(False)
    assert totals["search::query"]["calls"] == 2
    assert totals["search::query"]["totalMs"] >= 0


def test_spans_are_noop_without_listeners():
    store = _store()
    tracing.set_collect_totals(True)
    tracing.set_collect_totals(False)
    before = tracing.profile_totals()
    # nothing subscribed: spans must not accumulate anywhere
    perform_search(store, {"q": "quick"})
    assert tracing.profile_totals() == before


def test_logs_stream_route():
    from meilisearch_tpu.api.app import App, TestClient

    app = App()
    client = TestClient(app)
    client.patch("/experimental-features", body={"logsRoute": True})
    res = app.handle(
        __import__("meilisearch_tpu.api.app", fromlist=["Request"]).Request(
            method="POST",
            path="/logs/stream",
            query={},
            body={"mode": "profile", "target": "search::"},
            headers={"Content-Type": "application/json"},
        )
    )
    assert res.status == 200 and res.stream is not None
    # generate one span, then stop the stream and drain it
    store = app.scheduler._get_or_create_index("x")
    store.add_documents([{"id": 1, "t": "hello"}])
    perform_search(store, {"q": "hello"})
    app._logs_stream_active = False
    chunks = b"".join(res.stream)
    lines = [json.loads(l) for l in chunks.decode().splitlines() if l]
    assert any(l["target"].startswith("search::") for l in lines)


def test_explain_query_dot():
    store = _store()
    info = explain_query(store, 'quick "brown fox"')
    assert info["dot"].startswith("digraph QueryGraph")
    assert "quick" in info["dot"]
    originals = [t["original"] for t in info["terms"]]
    assert "quick" in originals
    phrase_terms = [t for t in info["terms"] if t["phrase"]]
    assert phrase_terms and phrase_terms[0]["phrase"] == ["brown", "fox"]
