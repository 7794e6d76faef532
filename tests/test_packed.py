"""Packed index snapshot (index/packed.py): full-fidelity round trip —
every posting/facet/vector/geo structure must reload equal, search
behavior identical, and the scheduler checkpoint/boot path must restore
through the packed loader."""

import numpy as np

from meilisearch_tpu.index.packed import load_index, save_index
from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import perform_search

DOCS = [
    {"id": i, "title": f"doc {i} " + ("rust systems" if i % 3 == 0 else "python web"),
     "author": f"user{i % 17}", "points": i % 53,
     "nested": {"tag": ["x", "y"][i % 2]},
     "_geo": {"lat": 10 + i % 5, "lng": 20 + i % 7},
     "_vectors": {"default": [float(i % 7), float(i % 11), 1.0]}}
    for i in range(300)
]
DOCS.append({"id": 999, "title": "empty facet", "author": "", "points": None})


def build() -> IndexStore:
    st = IndexStore("pk")
    st.settings.filterable_attributes = ["author", "points", "nested.tag", "_geo"]
    st.settings.sortable_attributes = ["points"]
    st.add_documents([dict(d) for d in DOCS])
    st.delete_documents(["5", "7"])  # exercise tombstones
    return st


def canon_posting(p):
    return sorted(p) if not hasattr(p, "ids_array") else p.ids_array().tolist()


def test_packed_roundtrip_equal(tmp_path):
    a = build()
    save_index(a, str(tmp_path / "idx.packed"))
    b = load_index(str(tmp_path / "idx.packed"))

    for name in (
        "word_docids", "exact_word_docids", "word_fid_docids",
        "word_position_docids", "word_pair_proximity_docids",
        "field_id_word_count_docids",
    ):
        ta, tb = getattr(a, name), getattr(b, name)
        ka = {k for k, p in ta.items() if len(canon_posting(p))}
        assert ka == set(tb.keys()), name
        for k in ka:
            assert canon_posting(ta[k]) == canon_posting(tb[k]), (name, k)
    for name in ("facet_number_docids", "facet_string_docids"):
        ta, tb = getattr(a, name), getattr(b, name)
        fa = {
            (fid, v): sorted(s)
            for fid, sub in ta.items()
            for v, s in sub.items()
            if s
        }
        fb = {
            (fid, v): sorted(s)
            for fid, sub in tb.items()
            for v, s in sub.items()
        }
        assert fa == fb, name
    for name in (
        "facet_exists_docids", "facet_is_null_docids", "facet_is_empty_docids",
    ):
        ta = {k: sorted(v) for k, v in getattr(a, name).items() if v}
        tb = {k: sorted(v) for k, v in getattr(b, name).items() if v}
        assert ta == tb, name
    assert dict(a.docid_facet_numbers) == dict(b.docid_facet_numbers)
    assert dict(a.docid_facet_strings) == dict(b.docid_facet_strings)
    assert a.facet_string_original == b.facet_string_original
    assert a.external_to_internal == b.external_to_internal
    assert a.geo_points == b.geo_points
    assert dict(a.documents.items()) == dict(b.documents.items())
    assert a.fields_ids_map.names() == b.fields_ids_map.names()
    assert a._next_docid == b._next_docid
    for emb in a.vectors:
        for d in a.vectors[emb]:
            assert np.array_equal(a.vectors[emb][d], b.vectors[emb][d])

    for q in (
        {"q": "rust", "limit": 10},
        {"q": "python", "filter": "points > 20", "sort": ["points:desc"], "limit": 10},
        {"q": "doc", "facets": ["author"], "limit": 5},
    ):
        assert perform_search(a, q)["hits"] == perform_search(b, q)["hits"], q


def test_packed_version_gate(tmp_path):
    import json
    import os

    import pytest

    a = build()
    d = str(tmp_path / "idx.packed")
    save_index(a, d)
    meta = json.load(open(os.path.join(d, "meta.json")))
    meta["formatVersion"] = 99
    json.dump(meta, open(os.path.join(d, "meta.json"), "w"))
    with pytest.raises(RuntimeError, match="refusing"):
        load_index(d)


def test_checkpoint_and_packed_boot_restore(tmp_path):
    from meilisearch_tpu.api.app import App, TestClient
    from meilisearch_tpu.engine.dumps import (
        create_packed_checkpoint,
        load_packed_checkpoint,
    )

    app = App()
    client = TestClient(app)
    client.update_settings("movies", {"filterableAttributes": ["genre"]})
    client.add_documents(
        "movies",
        [{"id": i, "title": f"film {i}", "genre": ["a", "b"][i % 2]} for i in range(40)],
    )
    create_packed_checkpoint(app.scheduler, str(tmp_path))

    app2 = App()
    assert load_packed_checkpoint(app2.scheduler, str(tmp_path))
    client2 = TestClient(app2)
    r = client2.post(
        "/indexes/movies/search", body={"q": "film", "filter": "genre = a"}
    )
    assert len(r.json["hits"]) == 20
    # terminal task history restored
    tasks = client2.get("/tasks").json["results"]
    assert any(t["type"] == "documentAdditionOrUpdate" for t in tasks)
    app.scheduler.stop()
    app2.scheduler.stop()
