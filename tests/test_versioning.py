"""Version gate + migration chain + real compaction (reference:
versioning.rs boot check, milli/src/update/upgrade/, LMDB copy-compact at
process_batch.rs:443)."""

import json
import tarfile
from io import BytesIO

import pytest

from meilisearch_tpu.engine.dumps import create_snapshot, load_snapshot
from meilisearch_tpu.engine.scheduler import IndexScheduler
from meilisearch_tpu.engine.versioning import (
    SNAPSHOT_FORMAT_VERSION,
    check_and_migrate,
)
from meilisearch_tpu.types.errors import EngineError


def _write_snapshot(tmp_path, data: dict) -> str:
    payload = json.dumps(data).encode()
    path = str(tmp_path / "data.ms.snapshot")
    with tarfile.open(path, "w:gz") as tar:
        info = tarfile.TarInfo("instance.json")
        info.size = len(payload)
        tar.addfile(info, BytesIO(payload))
    return path


def _scheduler_with_doc():
    s = IndexScheduler()
    store = s._get_or_create_index("movies", primary_key="id")
    store.add_documents([{"id": 1, "title": "versioned"}])
    return s


def test_snapshot_stamped_with_current_format(tmp_path):
    s = _scheduler_with_doc()
    path = create_snapshot(s, str(tmp_path))
    with tarfile.open(path) as tar:
        data = json.loads(tar.extractfile("instance.json").read())
    assert data["formatVersion"] == SNAPSHOT_FORMAT_VERSION
    assert data["engineVersion"]
    s.stop()


def test_newer_format_always_refused(tmp_path):
    path = _write_snapshot(
        tmp_path, {"formatVersion": SNAPSHOT_FORMAT_VERSION + 1, "indexes": {}}
    )
    s = IndexScheduler()
    with pytest.raises(EngineError, match="newer"):
        load_snapshot(s, path, allow_upgrade=True)
    s.stop()


def test_older_format_requires_upgrade(tmp_path):
    # a round-1-era snapshot: no formatVersion, legacy network shape
    v1 = {
        "indexes": {
            "movies": {
                "uid": "movies",
                "primaryKey": "id",
                "settings": {},
                "documents": [{"id": 1, "title": "old glass"}],
            }
        },
        "network": {"self": None, "remotes": {}, "sharding": False},
    }
    path = _write_snapshot(tmp_path, v1)
    s = IndexScheduler()
    with pytest.raises(EngineError, match="older"):
        load_snapshot(s, path)
    s.stop()

    # with the upgrade requested, the v1 -> v2 migration runs: the network
    # gains shards/leader/version and drops the legacy bool
    s = IndexScheduler()
    load_snapshot(s, path, allow_upgrade=True)
    assert s.network.get("shards") == {}
    assert "leader" in s.network and "version" in s.network
    assert "sharding" not in s.network
    assert s.index("movies").documents
    s.stop()


def test_migration_chain_is_stepwise():
    data = {"network": {"sharding": True}}
    out = check_and_migrate(dict(data), allow_upgrade=True)
    assert out["formatVersion"] == SNAPSHOT_FORMAT_VERSION


def test_upgrade_task(tmp_path):
    from meilisearch_tpu.engine.journal import TaskJournal
    from meilisearch_tpu.engine.tasks import TaskType

    s = _scheduler_with_doc()
    s.journal = TaskJournal(str(tmp_path))
    task = s.register(TaskType.UPGRADE_DATABASE, None, {"from": "v1"})
    s.wait_for_task(task.uid)
    t = s.queue.tasks[task.uid]
    assert t.status.value == "succeeded"
    assert t.details["upgradeTo"] == f"v{SNAPSHOT_FORMAT_VERSION}"
    s.stop()


def test_compaction_reports_and_shrinks():
    from meilisearch_tpu.engine.tasks import TaskType

    s = IndexScheduler()
    store = s._get_or_create_index("movies", primary_key="id")
    store.add_documents(
        [{"id": i, "title": f"compact me {i % 7}"} for i in range(200)]
    )
    # deletions leave tombstones in the LSM postings
    store.delete_documents([str(i) for i in range(0, 200, 2)])
    task = s.register(TaskType.INDEX_COMPACTION, "movies", {})
    s.wait_for_task(task.uid)
    t = s.queue.tasks[task.uid]
    assert t.status.value == "succeeded"
    pre = t.details["preCompactionSize"]
    post = t.details["postCompactionSize"]
    assert isinstance(pre, int) and isinstance(post, int)
    assert post < pre  # tombstones + segment overhead released
    # content unchanged
    from meilisearch_tpu.search.perform import perform_search

    res = perform_search(store, {"q": "compact", "limit": 5})
    assert res["estimatedTotalHits"] == 100
    s.stop()
