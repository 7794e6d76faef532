"""Golden port of the reference search-queue suite
(crates/meilisearch/tests/search/search_queue.rs): permit accounting,
oldest-waiter bumping when the queue is full, crash-safe release, the
zero-capacity case, and the pinned 503 error + Retry-After header."""

import threading
import time

import pytest

from meilisearch_tpu.engine.search_queue import SearchQueue
from meilisearch_tpu.types.errors import EngineError


class Holder:
    """A thread holding (or waiting on) one permit."""

    def __init__(self, queue, crash=False):
        self.queue = queue
        self.acquired = threading.Event()
        self.release_now = threading.Event()
        self.error = None
        self.done = threading.Event()
        self.crash = crash
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            with self.queue.permit():
                self.acquired.set()
                self.release_now.wait(timeout=10)
                if self.crash:
                    raise RuntimeError("oops an unexpected crash happened")
        except EngineError as e:
            self.error = e
        except RuntimeError:
            pass
        self.done.set()

    def release(self):
        self.release_now.set()
        self.done.wait(timeout=5)


def test_search_queue_register():
    # search_queue.rs:10 — new(4, 2): two permits run, freed slots reuse
    q = SearchQueue(capacity=4, parallelism=2, drop_after_s=1.0)
    p1 = Holder(q)
    p2 = Holder(q)
    assert p1.acquired.wait(1) and p2.acquired.wait(1)
    p1.release()
    p3 = Holder(q)
    assert p3.acquired.wait(1)
    p3.release()
    p4 = Holder(q)
    assert p4.acquired.wait(1)
    p4.release()
    p2.release()


def test_wait_till_cores_are_available():
    # search_queue.rs:79 — new(4, 1): the second waits until a drop
    q = SearchQueue(capacity=4, parallelism=1, drop_after_s=5.0)
    p1 = Holder(q)
    assert p1.acquired.wait(1)
    p2 = Holder(q)
    assert not p2.acquired.wait(0.3), "capacity full: no permit yet"
    p1.release()
    assert p2.acquired.wait(1)
    p2.release()


def test_refuse_search_requests_when_queue_is_full():
    # search_queue.rs:103 — new(1, 1): the OLDEST waiter is bumped
    q = SearchQueue(capacity=1, parallelism=1, drop_after_s=5.0)
    p1 = Holder(q)
    assert p1.acquired.wait(1)
    p2 = Holder(q)
    time.sleep(0.1)  # ensure p2 queues before p3 arrives
    p3 = Holder(q)
    assert p2.done.wait(1), "the bumped waiter must return immediately"
    assert p2.error is not None
    assert (
        str(p2.error)
        == "Too many search requests running at the same time: 1. Retry"
        " after 10s."
    )
    assert p2.error.code.value == "too_many_search_requests"
    assert p2.error.code.http_status == 503
    p1.release()
    assert p3.acquired.wait(1)
    p3.release()


def test_search_request_crashes_while_holding_permits():
    # search_queue.rs:146 — a crash releases the permit
    q = SearchQueue(capacity=1, parallelism=1, drop_after_s=5.0)
    p1 = Holder(q, crash=True)
    assert p1.acquired.wait(1)
    p2 = Holder(q)
    p1.release()  # triggers the crash inside the permit
    assert p2.acquired.wait(1), "crashed holder must free its permit"
    p2.release()
    p3 = Holder(q)
    assert p3.acquired.wait(1)
    p3.release()


def test_works_with_capacity_of_zero():
    # search_queue.rs:183 — new(0, 1): one permit runs, waiting refused
    q = SearchQueue(capacity=0, parallelism=1, drop_after_s=5.0)
    p1 = Holder(q)
    assert p1.acquired.wait(1)
    with pytest.raises(EngineError) as err:
        with q.permit():
            pass
    assert (
        str(err.value)
        == "Too many search requests running at the same time: 0. Retry"
        " after 10s."
    )
    p1.release()
    p3 = Holder(q)
    assert p3.acquired.wait(1)
    p3.release()


def test_time_to_abort():
    # search_queue.rs:60 — a waiter aborts after drop_after_s
    q = SearchQueue(capacity=1, parallelism=1, drop_after_s=0.3)
    p1 = Holder(q)
    assert p1.acquired.wait(1)
    p2 = Holder(q)
    assert p2.done.wait(2)
    assert p2.error is not None
    assert p2.error.code.value == "too_many_search_requests"
    p1.release()


def test_http_retry_after_header(monkeypatch):
    # the bumped request's HTTP response carries Retry-After: 10.
    # Disable the micro-batcher: batched searches wait inside the batcher
    # instead of consuming a per-core permit (api/app.py _batcher_handles)
    monkeypatch.setenv("MEILI_TPU_MICROBATCH", "0")
    from meilisearch_tpu.api.app import App, TestClient

    app = App()
    app.search_queue = SearchQueue(capacity=0, parallelism=1)
    c = TestClient(app)
    c.add_documents("t", [{"id": 1, "x": "y"}])
    # occupy the single permit directly
    assert app.search_queue.try_acquire() is None
    try:
        res = c.search("t", {"q": "y"})
        assert res.status == 503, res.json
        assert res.headers.get("Retry-After") == "10"
        assert res.json["code"] == "too_many_search_requests"
        assert res.json["type"] == "system"
    finally:
        app.search_queue.release()
        app.scheduler.stop()
