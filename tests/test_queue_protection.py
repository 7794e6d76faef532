"""Task-queue self-protection and cooperative abort.

Reference: index-scheduler lib.rs:809 NoSpaceLeftInTaskQueue,
queue/mod.rs:289 cleanup_task_queue, milli must_stop_processing.rs.
"""

import threading
import time

import pytest

from meilisearch_tpu.engine.scheduler import IndexScheduler
from meilisearch_tpu.engine.tasks import TaskStatus, TaskType
from meilisearch_tpu.index.store import AbortedProcessing, IndexStore
from meilisearch_tpu.types.errors import EngineError


def test_register_refused_when_queue_full():
    scheduler = IndexScheduler(autobatching_enabled=False)
    scheduler.max_number_of_tasks = 3
    for _ in range(3):
        scheduler.queue.register(TaskType.INDEX_CREATION, "x", {}, {})
    with pytest.raises(EngineError) as err:
        scheduler.register(TaskType.INDEX_CREATION, "x", {}, {})
    assert err.value.code.value == "no_space_left_on_device"
    assert "limit of the task database" in str(err.value)
    # task deletions are still accepted so users can free space
    scheduler.register(TaskType.TASK_DELETION, None, {}, {"filters": {}})
    scheduler.stop()


def test_cleanup_deletes_oldest_finished():
    scheduler = IndexScheduler(autobatching_enabled=False)
    scheduler.max_number_of_tasks = 4
    for i in range(5):
        t = scheduler.queue.register(TaskType.INDEX_CREATION, "x", {}, {})
        if i < 3:
            t.status = TaskStatus.SUCCEEDED
    deleted = scheduler.cleanup_task_queue()
    assert deleted == 3
    assert len(scheduler.queue.tasks) == 2
    scheduler.stop()


def test_must_stop_rolls_back_add_documents():
    store = IndexStore("m", primary_key="id")
    store.add_documents([{"id": 1, "t": "original one"}])
    stop = threading.Event()

    def docs():
        yield {"id": 1, "t": "replaced one"}
        yield {"id": 2, "t": "brand new"}
        stop.set()  # abort before doc 3
        yield {"id": 3, "t": "never lands"}

    with pytest.raises(AbortedProcessing):
        store.add_documents(docs(), must_stop=stop)

    # rolled back: doc 1 restored, docs 2/3 absent
    assert len(store.documents) == 1
    docid = store.external_to_internal["1"]
    assert store.documents[docid]["t"] == "original one"
    # postings restored too
    from meilisearch_tpu.search.perform import perform_search

    assert [h["id"] for h in perform_search(store, {"q": "original"})["hits"]] == [1]
    assert perform_search(store, {"q": "replaced"})["hits"] == []
    assert perform_search(store, {"q": "brand"})["hits"] == []


def test_cancelation_aborts_processing_batch():
    scheduler = IndexScheduler()
    gate = threading.Event()
    entered = threading.Event()

    def slow_docs():
        yield {"id": 1, "t": "first"}
        entered.set()
        gate.wait(timeout=5)  # hold the batch mid-task
        for i in range(2, 6):
            yield {"id": i, "t": f"doc {i}"}

    class LazyDocs:
        def __iter__(self):
            return slow_docs()

    task = scheduler.register(
        TaskType.DOCUMENT_ADDITION_OR_UPDATE,
        "m",
        {},
        {"documents": LazyDocs(), "method": "replace"},
    )
    assert entered.wait(timeout=5)
    cancel = scheduler.register(
        TaskType.TASK_CANCELATION,
        None,
        {},
        {"query": f"uids={task.uid}", "filters": {"uids": [task.uid]}},
    )
    gate.set()
    scheduler.wait_for_task(task.uid, timeout=10)
    scheduler.wait_for_task(cancel.uid, timeout=10)
    assert task.status == TaskStatus.CANCELED
    assert task.canceled_by == cancel.uid
    # the aborted addition left no documents behind
    assert len(scheduler.index("m").documents) == 0
    scheduler.stop()
