"""V6 dump compatibility: reading real-meilisearch dump archives and
round-tripping our own (engine/dumps.py, reference crates/dump layout)."""

import io
import json
import tarfile

import pytest

from meilisearch_tpu.engine.auth import AuthController
from meilisearch_tpu.engine.dumps import create_dump, load_dump
from meilisearch_tpu.engine.scheduler import IndexScheduler


def _make_reference_dump(path):
    """Builds a dump exactly like crates/dump/README.md describes."""

    def add(tar, name, data: bytes):
        info = tarfile.TarInfo(name)
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))

    with tarfile.open(path, "w:gz") as tar:
        add(
            tar,
            "metadata.json",
            json.dumps(
                {
                    "dumpVersion": "V6",
                    "dbVersion": "1.12.0",
                    "dumpDate": "2024-01-01T00:00:00Z",
                }
            ).encode(),
        )
        add(tar, "instance_uid.uuid", b"9e1f4cf6-0000-0000-0000-000000000000")
        add(
            tar,
            "keys.jsonl",
            (
                json.dumps(
                    {
                        "name": "imported-key",
                        "uid": "fe7a3bc2-1111-2222-3333-444455556666",
                        "actions": ["search"],
                        "indexes": ["movies"],
                        "expiresAt": None,
                    }
                )
                + "\n"
            ).encode(),
        )
        add(tar, "tasks/queue.jsonl", b"")
        add(tar, "batches/queue.jsonl", b"")
        add(
            tar,
            "indexes/movies/metadata.json",
            json.dumps(
                {
                    "uid": "movies",
                    "primaryKey": "id",
                    "createdAt": "2024-01-01T00:00:00Z",
                    "updatedAt": "2024-01-01T00:00:00Z",
                }
            ).encode(),
        )
        docs = [
            {"id": 1, "title": "Carol", "genre": "drama"},
            {"id": 2, "title": "Mad Max", "genre": "action"},
        ]
        add(
            tar,
            "indexes/movies/documents.jsonl",
            "".join(json.dumps(d) + "\n" for d in docs).encode(),
        )
        add(
            tar,
            "indexes/movies/settings.json",
            json.dumps(
                {
                    "searchableAttributes": ["title"],
                    "filterableAttributes": ["genre"],
                    "someFutureUnknownSetting": {"x": 1},
                }
            ).encode(),
        )


def test_import_reference_v6_dump(tmp_path):
    dump_path = tmp_path / "ref.dump"
    _make_reference_dump(dump_path)
    scheduler = IndexScheduler()
    auth = AuthController("masterkey0123456")
    load_dump(scheduler, str(dump_path), auth=auth)

    store = scheduler.indexes["movies"]
    assert store.primary_key == "id"
    assert len(store.documents) == 2
    assert store.settings.filterable_attribute_names() == ["genre"]

    from meilisearch_tpu.search.perform import perform_search

    res = perform_search(store, {"q": "carol"})
    assert [h["id"] for h in res["hits"]] == [1]
    # genre is filterable but NOT searchable (settings applied)
    res = perform_search(store, {"q": "drama"})
    assert res["hits"] == []

    assert any(k.name == "imported-key" for k in auth.list_keys())


def test_unsupported_version_rejected(tmp_path):
    # V1-V5 now import through the legacy compat readers (reference
    # dump/src/reader compat chain); only unknown/future versions reject
    dump_path = tmp_path / "future.dump"
    with tarfile.open(dump_path, "w:gz") as tar:
        data = json.dumps({"dumpVersion": "V99"}).encode()
        info = tarfile.TarInfo("metadata.json")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    with pytest.raises(ValueError) as err:
        load_dump(IndexScheduler(), str(dump_path))
    assert "V99" in str(err.value)


def test_round_trip_own_dump(tmp_path):
    scheduler = IndexScheduler()
    store = scheduler._get_or_create_index("books", primary_key="id")
    store.settings.apply_json({"filterableAttributes": ["tag"]})
    store.add_documents(
        [
            {"id": 1, "t": "alpha", "tag": "x",
             "_vectors": {"e": {"embeddings": [1.0, 0.0], "regenerate": False}}},
            {"id": 2, "t": "beta", "tag": "y"},
        ]
    )
    uid = create_dump(scheduler, str(tmp_path))
    dump_file = tmp_path / f"{uid}.dump"
    assert dump_file.exists()

    # the archive is the reference layout
    with tarfile.open(dump_file, "r:gz") as tar:
        names = set(tar.getnames())
    assert "metadata.json" in names
    assert "indexes/books/documents.jsonl" in names
    assert "indexes/books/settings.json" in names

    other = IndexScheduler()
    load_dump(other, str(dump_file))
    restored = other.indexes["books"]
    assert len(restored.documents) == 2
    assert restored.settings.filterable_attribute_names() == ["tag"]
    # user-provided vectors survive the round trip
    assert 0 in restored.vectors["e"]


def test_dump_round_trip_preserves_search_behavior(tmp_path):
    """Property: export + import must preserve ranking, filters, facets and
    settings-derived behavior for a randomized store."""
    import numpy as np

    from meilisearch_tpu.search.perform import perform_search

    rng = np.random.default_rng(11)
    words = ["ruby", "python", "rust", "golang", "zig", "swift"]
    docs = []
    for i in range(120):
        docs.append(
            {
                "id": i,
                "title": " ".join(rng.choice(words, size=int(rng.integers(1, 5)))),
                "stars": int(rng.integers(0, 1000)),
                "lang": str(rng.choice(words)),
            }
        )
    src = IndexScheduler()
    store = src._get_or_create_index("repos", primary_key="id")
    store.settings.apply_json(
        {
            "filterableAttributes": ["stars", "lang"],
            "sortableAttributes": ["stars"],
            "stopWords": ["the"],
            "synonyms": {"golang": ["go"]},
        }
    )
    store.add_documents(docs)

    uid = create_dump(src, str(tmp_path))
    dst = IndexScheduler()
    load_dump(dst, str(tmp_path / f"{uid}.dump"))
    restored = dst.indexes["repos"]

    queries = [
        {"q": "rust"},
        {"q": "pythn rust"},  # typo
        {"q": "go"},  # synonym
        {"q": "", "filter": "stars > 500", "sort": ["stars:desc"], "limit": 50},
        {"q": "swift", "facets": ["lang"]},
    ]
    for q in queries:
        a = perform_search(store, dict(q))
        b = perform_search(restored, dict(q))
        assert [h["id"] for h in a["hits"]] == [h["id"] for h in b["hits"]], q
        assert a.get("facetDistribution") == b.get("facetDistribution"), q
        assert a["estimatedTotalHits"] == b["estimatedTotalHits"], q

    src.stop()
    dst.stop()
