"""Documents-on-disk spill mode (index/docs.py): search behavior must be
identical to the RAM backend, updates/deletes work, and vacuum reclaims
orphaned versions (reference: documents always live on disk in the
`documents` LMDB database — corpus ≫ RAM is an L6 design requirement)."""

import json

import pytest

from meilisearch_tpu.index.docs import DocTable
from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import perform_search

DOCS = [
    {"id": i, "title": f"doc {i} " + ("rust " if i % 3 == 0 else "python "),
     "points": i * 7 % 101, "tags": ["a", "b"] if i % 2 else []}
    for i in range(500)
]


def build(spill: bool) -> IndexStore:
    st = IndexStore("t")
    st.settings.filterable_attributes = ["points"]
    st.settings.sortable_attributes = ["points"]
    if spill:
        st.documents.enable_spill()
    st.add_documents([dict(d) for d in DOCS])
    return st


def test_spill_search_parity():
    a, b = build(False), build(True)
    assert b.documents.spilled and not a.documents.spilled
    for q in (
        {"q": "rust", "limit": 10},
        {"q": "python", "filter": "points > 50", "limit": 10},
        {"q": "doc", "sort": ["points:desc"], "limit": 10},
    ):
        ra, rb = perform_search(a, q), perform_search(b, q)
        assert ra["hits"] == rb["hits"], q


def test_spill_update_delete_vacuum():
    st = build(True)
    st.add_documents([{"id": 1, "title": "doc 1 replaced rust", "points": 5}])
    assert st.documents[1]["title"] == "doc 1 replaced rust"
    st.delete_documents(["2"])
    assert 2 not in st.documents
    assert len(st.documents) == len(DOCS) - 1
    before = st.documents.file_bytes()
    reclaimed = st.documents.vacuum()
    assert reclaimed > 0
    assert st.documents.file_bytes() == before - reclaimed
    # reads still correct after the in-place rewrite
    assert st.documents[1]["title"] == "doc 1 replaced rust"
    r = perform_search(st, {"q": "replaced", "limit": 5})
    assert [h["id"] for h in r["hits"]] == [1]


def test_spill_migrates_existing_docs():
    t = DocTable()
    t[0] = {"x": 1}
    t[1] = {"y": [1, 2, {"z": None}]}
    t.enable_spill()
    assert t[0] == {"x": 1} and t[1] == {"y": [1, 2, {"z": None}]}
    assert len(t) == 2 and sorted(t.keys()) == [0, 1]
    assert dict(t.items()) == {0: {"x": 1}, 1: {"y": [1, 2, {"z": None}]}}
    t.clear()
    assert len(t) == 0 and t.file_bytes() == 0


def test_spill_json_roundtrip_fidelity():
    t = DocTable()
    t.enable_spill()
    doc = {"id": 1, "f": 1.5, "i": 2**53, "s": "héllo ", "b": True,
           "n": None, "lst": [1, "x", {"k": []}]}
    t[1] = doc
    assert t[1] == json.loads(json.dumps(doc))


def test_compaction_task_vacuums_documents(tmp_path):
    from meilisearch_tpu.api.app import App, TestClient

    app = App()
    client = TestClient(app)
    store = app.scheduler._get_or_create_index("m", primary_key="id")
    store.documents.enable_spill()
    client.add_documents("m", [{"id": i, "title": f"v1 {i}"} for i in range(50)])
    client.add_documents("m", [{"id": i, "title": f"v2 {i}"} for i in range(50)])
    waste = store.documents.file_bytes() - store.documents.live_bytes()
    assert waste > 0
    res = client.post("/indexes/m/compact")
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded", task
    assert store.documents.file_bytes() == store.documents.live_bytes()
    r = client.post("/indexes/m/search", body={"q": "v2"})
    assert r.json["hits"]
    app.scheduler.stop()
