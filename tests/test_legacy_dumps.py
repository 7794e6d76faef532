"""V1-V5 dump compat readers (reference dump/src/reader/v1..v5 +
compat chain): each historical layout must import indexes, documents and
settings — including v1 `dsc(field)` criteria and attributesForFaceting —
into the current model."""

import io
import json
import tarfile

import pytest

from meilisearch_tpu.engine.dumps import load_dump
from meilisearch_tpu.engine.scheduler import IndexScheduler


def make_tar(tmp_path, files: dict) -> str:
    path = str(tmp_path / "dump.tar.gz")
    with tarfile.open(path, "w:gz") as tar:
        for name, content in files.items():
            if isinstance(content, (dict, list)):
                content = json.dumps(content).encode()
            elif isinstance(content, str):
                content = content.encode()
            info = tarfile.TarInfo(name)
            info.size = len(content)
            tar.addfile(info, io.BytesIO(content))
    return path


DOCS = "\n".join(
    json.dumps(d)
    for d in (
        {"id": 1, "title": "carol", "genre": "drama"},
        {"id": 2, "title": "wonder woman", "genre": "action"},
    )
)


def run_import(tmp_path, files):
    sched = IndexScheduler(autobatching_enabled=False)
    load_dump(sched, make_tar(tmp_path, files), auth=None)
    return sched


def check_movies(sched):
    store = sched.index("movies")
    assert len(store.documents) == 2
    from meilisearch_tpu.search.perform import perform_search

    res = perform_search(store, {"q": "carol"})
    assert [h["id"] for h in res["hits"]] == [1]
    return store


def test_v1_dump(tmp_path):
    sched = run_import(
        tmp_path,
        {
            "metadata.json": {
                "dumpVersion": "V1",
                "indexes": [{"name": "movies", "uid": "movies"}],
            },
            "movies/documents.jsonl": DOCS,
            "movies/settings.json": {
                "rankingRules": [
                    "typo", "words", "proximity", "attribute",
                    "wordsPosition", "exactness", "dsc(release_date)",
                ],
                "attributesForFaceting": ["genre"],
                "searchableAttributes": ["title"],
            },
            "movies/updates.jsonl": "",
        },
    )
    store = check_movies(sched)
    assert "genre" in store.settings.filterable_attribute_names()
    assert "release_date:desc" in store.settings.ranking_rules
    assert "wordPosition" in store.settings.ranking_rules


def test_v2_dump(tmp_path):
    uuid = "0000-1"
    sched = run_import(
        tmp_path,
        {
            "metadata.json": {"dumpVersion": "V2"},
            "index_uuids/data.jsonl": json.dumps(
                {"uid": "movies", "uuid": uuid}
            ),
            f"indexes/index-{uuid}/meta.json": {
                "settings": {
                    "ranking_rules": ["words", "typo", "desc(points)"],
                    "attributes_for_faceting": ["genre"],
                },
                "primary_key": "id",
            },
            f"indexes/index-{uuid}/documents.jsonl": DOCS,
        },
    )
    store = check_movies(sched)
    assert store.primary_key == "id"
    assert "points:desc" in store.settings.ranking_rules


@pytest.mark.parametrize("version", ["V3", "V4", "V5"])
def test_v3_v4_v5_dump(tmp_path, version):
    uuid = "0000-2"
    uuids_row = (
        {"uid": "movies", "uuid": uuid}
        if version == "V3"
        else {"uid": "movies", "index_meta": {"uuid": uuid, "creation_task_id": 0}}
    )
    sched = run_import(
        tmp_path,
        {
            "metadata.json": {"dumpVersion": version},
            "index_uuids/data.jsonl": json.dumps(uuids_row),
            f"indexes/{uuid}/meta.json": {
                "settings": {
                    "rankingRules": ["words", "typo", "proximity"],
                    "filterableAttributes": ["genre"],
                    "sortableAttributes": ["points"],
                },
                "primaryKey": "id",
            },
            f"indexes/{uuid}/documents.jsonl": DOCS,
        },
    )
    store = check_movies(sched)
    assert "genre" in store.settings.filterable_attribute_names()


def test_v5_keys(tmp_path):
    from meilisearch_tpu.engine.auth import AuthController

    uuid = "0000-3"
    auth = AuthController(master_key="masterkey1234567")
    sched = IndexScheduler(autobatching_enabled=False)
    path = make_tar(
        tmp_path,
        {
            "metadata.json": {"dumpVersion": "V5"},
            "index_uuids/data.jsonl": json.dumps(
                {"uid": "movies", "index_meta": {"uuid": uuid}}
            ),
            f"indexes/{uuid}/meta.json": {"settings": {}, "primaryKey": "id"},
            f"indexes/{uuid}/documents.jsonl": DOCS,
            "keys": json.dumps(
                {
                    "description": "legacy search key",
                    "actions": ["search"],
                    "indexes": ["movies"],
                    "expiresAt": None,
                }
            ),
        },
    )
    load_dump(sched, path, auth=auth)
    assert any(
        (k.description == "legacy search key") for k in auth.list_keys()
    )


def test_unknown_version_rejected(tmp_path):
    with pytest.raises(ValueError):
        run_import(tmp_path, {"metadata.json": {"dumpVersion": "V99"}})
