"""Build-side memory spill (reference BalancedCaches grenad spill,
update/new/extract/cache.rs:1-60): past the byte budget, posting docids
re-serialize as mmap'd columns; queries are unchanged and RSS becomes
evictable page cache."""

import numpy as np
import pytest

from meilisearch_tpu.api.app import App, TestClient
from meilisearch_tpu.index.store import IndexStore


DOCS = [
    {"id": i, "title": f"word{i % 50} common text", "points": i % 7}
    for i in range(500)
]


def test_spill_postings_preserves_queries(tmp_path):
    s = IndexStore("sp", primary_key="id")
    s.settings.apply_json({"filterableAttributes": ["points"]})
    s.add_documents(DOCS)

    from meilisearch_tpu.search.perform import perform_search

    before = perform_search(s, {"q": "word3 common", "limit": 10})
    moved = s.spill_postings(str(tmp_path))
    assert moved > 0
    # posting arrays are now views into the spilled mmap columns
    p = s.word_docids["common"]
    seg = p.ids_array()
    assert not seg.flags["OWNDATA"]
    after = perform_search(s, {"q": "word3 common", "limit": 10})
    assert [h["id"] for h in before["hits"]] == [h["id"] for h in after["hits"]]
    # facet spill too
    f = perform_search(s, {"q": "common", "filter": "points = 3", "limit": 5})
    assert all(h["points"] == 3 for h in f["hits"])
    # a second spill is a no-op on already-spilled content
    assert s.spill_postings(str(tmp_path)) == 0
    # writes after a spill still work (new segments overlay the views)
    s.add_documents([{"id": 9999, "title": "word3 common fresh"}])
    r = perform_search(s, {"q": "fresh", "limit": 5})
    assert [h["id"] for h in r["hits"]] == [9999]


def test_scheduler_spills_past_budget(tmp_path, monkeypatch):
    monkeypatch.setenv("MEILI_TPU_BUILD_SPILL_BYTES", "1")
    app = App()
    client = TestClient(app)
    client.add_documents("sp", DOCS)
    store = app.scheduler.index("sp")
    p = store.word_docids["common"]
    assert not p.ids_array().flags["OWNDATA"]  # spilled to mmap
    res = client.search("sp", {"q": "word3 common"})
    assert res.status == 200 and res.json["hits"]
    app.scheduler.stop()
