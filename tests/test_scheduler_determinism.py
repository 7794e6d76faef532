"""Deterministic scheduler tests: breakpoints + fault injection
(reference: index-scheduler/src/test_utils.rs + scheduler/test_failure.rs)."""

import threading

import pytest

from meilisearch_tpu.api.app import App, TestClient
from meilisearch_tpu.engine.tasks import TaskStatus


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def test_breakpoints_lockstep(client):
    """Lock-step the scheduler thread against the test."""
    scheduler = client.app.scheduler
    stages = []
    gate = threading.Event()
    reached_batch = threading.Event()

    def hook(stage):
        stages.append(stage)
        if stage == "batch_created":
            reached_batch.set()
            gate.wait(timeout=5)

    scheduler.breakpoint_hook = hook
    res = client.post("/indexes/movies/documents", body=[{"id": 1}])
    uid = res.json["taskUid"]

    assert reached_batch.wait(timeout=5)
    # while the scheduler is parked at the breakpoint, the task is enqueued
    # or just started — not finished
    task = scheduler.queue.tasks[uid]
    assert task.status in (TaskStatus.ENQUEUED, TaskStatus.PROCESSING)

    gate.set()
    client.wait_for_task(uid)
    assert "batch_created" in stages
    assert "inside_process_batch" in stages
    assert "batch_processed" in stages


def test_planned_failure_marks_tasks_failed(client):
    """Fault injection: a crash inside batch processing fails the tasks but
    the scheduler keeps running (the catch_unwind model)."""
    scheduler = client.app.scheduler
    scheduler.failure_locations.add("inside_process_batch")
    res = client.post("/indexes/movies/documents", body=[{"id": 1}])
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "failed"
    assert "planned failure" in task["error"]["message"]

    # the scheduler survives: subsequent tasks succeed
    scheduler.failure_locations.clear()
    res = client.post("/indexes/movies/documents", body=[{"id": 2}])
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    assert client.get("/indexes/movies/documents").json["total"] == 1


def test_documents_sort_param(client):
    client.add_documents(
        "movies",
        [
            {"id": 1, "rating": 3},
            {"id": 2, "rating": 1},
            {"id": 3, "rating": "high"},
            {"id": 4},
        ],
    )
    res = client.get("/indexes/movies/documents?sort=rating:asc")
    ids = [d["id"] for d in res.json["results"]]
    # numbers first, then strings, missing last
    assert ids == [2, 1, 3, 4]
    res = client.get("/indexes/movies/documents?sort=rating:desc")
    ids = [d["id"] for d in res.json["results"]]
    assert ids == [3, 1, 2, 4]
