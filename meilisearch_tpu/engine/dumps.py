"""Dumps and snapshots.

Reference: crates/dump (logical, version-independent export: metadata, keys,
tasks, per-index settings + documents) and
index-scheduler/src/scheduler/process_snapshot_creation.rs (physical copy).

Both serialize to a single archive; dumps can be re-imported across versions.
"""

from __future__ import annotations

import gzip
import json
import os
import tarfile
import tempfile
import time
from datetime import datetime, timezone
from io import BytesIO
from typing import Optional

import numpy as np

DUMP_VERSION = "V6"


def _dump_uid() -> str:
    return datetime.now(timezone.utc).strftime("%Y%m%d-%H%M%S%f")[:-3]


def serialize_instance(scheduler) -> dict:
    """Logical export of the whole instance."""
    indexes = {}
    with scheduler.lock:
        for uid, store in scheduler.indexes.items():
            vectors_meta = {}
            for emb, per_doc in store.vectors.items():
                vectors_meta[emb] = {
                    str(docid): arr.tolist() for docid, arr in per_doc.items()
                }
            indexes[uid] = {
                "uid": uid,
                "primaryKey": store.primary_key,
                "createdAt": store.created_at,
                "updatedAt": store.updated_at,
                "settings": store.settings.to_json(),
                "documents": [
                    store.documents[d]
                    for d in sorted(store.documents.keys())
                ],
            }
        tasks = [t.to_json() for t in scheduler.queue.tasks.values()]
    return {
        "dumpVersion": DUMP_VERSION,
        "dbVersion": "1.50.0-tpu",
        "dumpDate": time.time(),
        "indexes": indexes,
        "tasks": tasks,
        "network": scheduler.network,
        "features": scheduler.runtime_features,
    }


def create_dump(scheduler, path: Optional[str] = None) -> str:
    uid = _dump_uid()
    directory = path or os.path.join(tempfile.gettempdir(), "meili_tpu_dumps")
    os.makedirs(directory, exist_ok=True)
    payload = json.dumps(serialize_instance(scheduler)).encode("utf-8")
    file_path = os.path.join(directory, f"{uid}.dump")
    with gzip.open(file_path, "wb") as f:
        f.write(payload)
    return uid


def load_dump(scheduler, file_path: str) -> None:
    with gzip.open(file_path, "rb") as f:
        data = json.loads(f.read().decode("utf-8"))
    import_instance(scheduler, data)


def import_instance(scheduler, data: dict) -> None:
    from ..index.store import IndexStore

    with scheduler.lock:
        for uid, idx in data.get("indexes", {}).items():
            store = IndexStore(uid, primary_key=idx.get("primaryKey"))
            store.settings.apply_json(idx.get("settings", {}))
            if idx.get("documents"):
                store.add_documents(idx["documents"])
            scheduler.indexes[uid] = store
        scheduler.network = data.get("network", scheduler.network)
        for k, v in (data.get("features") or {}).items():
            if k in scheduler.runtime_features:
                scheduler.runtime_features[k] = v


def create_snapshot(scheduler, path: Optional[str] = None) -> str:
    """Physical-style snapshot: one tar.gz with the logical state (our device
    snapshots are rebuilt from it at import; the reference tars the LMDB
    envs, process_snapshot_creation.rs:81)."""
    directory = path or os.path.join(tempfile.gettempdir(), "meili_tpu_snapshots")
    os.makedirs(directory, exist_ok=True)
    payload = json.dumps(serialize_instance(scheduler)).encode("utf-8")
    file_path = os.path.join(directory, "data.ms.snapshot")
    buf = BytesIO(payload)
    with tarfile.open(file_path, "w:gz") as tar:
        info = tarfile.TarInfo("instance.json")
        info.size = len(payload)
        tar.addfile(info, buf)
    return file_path


def load_snapshot(scheduler, file_path: str) -> None:
    with tarfile.open(file_path, "r:gz") as tar:
        member = tar.getmember("instance.json")
        data = json.loads(tar.extractfile(member).read().decode("utf-8"))
    import_instance(scheduler, data)
