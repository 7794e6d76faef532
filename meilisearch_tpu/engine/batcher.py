"""Continuous micro-batching of concurrent search requests.

The reference serves one search per CPU core (search_queue.rs permits +
spawn_blocking); the TPU-native replacement makes BATCHES the unit of
serving: a single executor thread drains whatever requests are queued (up
to MAX_BATCH per index) and runs them through perform_search_many, whose
device-eligible queries share one device execute
(search/device_batch.py). Continuous batching means no artificial window:
under load, requests pile up while the previous batch executes and the
next batch is naturally full; a lone request executes immediately.

Only bodies whose keys are device-batchable are routed here (cheap check,
no store access); everything else takes the direct path. The waiting
request threads never hold the store lock, so the executor thread cannot
deadlock against them.
"""

from __future__ import annotations

import os
import threading
import time as _time
from typing import Any, Optional

MAX_BATCH = 32


class _Pending:
    __slots__ = ("store", "body", "features", "event", "result", "error")

    def __init__(self, store, body, features):
        self.store = store
        self.body = body
        self.features = features
        self.event = threading.Event()
        self.result: Optional[dict] = None
        self.error: Optional[BaseException] = None


class SearchBatcher:
    def __init__(self):
        self.lock = threading.Lock()
        self.queue: list[_Pending] = []
        self.wake = threading.Event()
        self._stop = False
        self._thread: Optional[threading.Thread] = None

    def _ensure_thread(self):
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(
                target=self._run, name="search-batcher", daemon=True
            )
            self._thread.start()

    def stop(self):
        self._stop = True
        self.wake.set()

    def submit(self, store, body: dict, features=None) -> dict:
        """Queue a search and wait for its response.

        The wait is bounded but generous: a cold persistent compile cache
        means the first arena-kernel execute can spend minutes inside XLA
        (jax_setup.py measured 28-290 s per variant over the tunnel), and
        every queued request legitimately waits behind it. Only a dead
        executor thread or the hard cap raises."""
        entry = _Pending(store, body, features)
        with self.lock:
            self._ensure_thread()
            self.queue.append(entry)
        self.wake.set()
        deadline = _time.monotonic() + float(
            os.environ.get("MEILI_TPU_BATCHER_TIMEOUT", "900")
        )
        while not entry.event.wait(timeout=5.0):
            if _time.monotonic() > deadline:
                raise TimeoutError("search batcher timed out")
            if self._thread is None or not self._thread.is_alive():
                # executor died (interpreter teardown / unrecoverable error):
                # don't strand the caller
                if not entry.event.is_set():
                    raise TimeoutError("search batcher thread died")
        if entry.error is not None:
            raise entry.error
        return entry.result

    def _run(self):
        from ..search.perform import perform_search_many

        while not self._stop:
            self.wake.wait(timeout=1.0)
            with self.lock:
                if not self.queue:
                    self.wake.clear()
                    continue
                batch = self.queue[:MAX_BATCH]
                del self.queue[: len(batch)]
                if not self.queue:
                    self.wake.clear()
            # group by store: one perform_search_many per index
            by_store: dict[int, list[_Pending]] = {}
            for e in batch:
                by_store.setdefault(id(e.store), []).append(e)
            for entries in by_store.values():
                try:
                    results = perform_search_many(
                        entries[0].store,
                        [e.body for e in entries],
                        entries[0].features,
                    )
                    for e, r in zip(entries, results):
                        e.result = r
                except BaseException as err:  # noqa: BLE001 — relayed to callers
                    for e in entries:
                        e.error = err
                for e in entries:
                    e.event.set()


def microbatch_enabled() -> bool:
    return os.environ.get("MEILI_TPU_MICROBATCH", "1") == "1"


def batchable_body(body: dict) -> bool:
    from ..search.perform import _DEVICE_BATCH_SAFE_KEYS

    return set(body) <= _DEVICE_BATCH_SAFE_KEYS and (
        body.get("matchingStrategy") in (None, "last")
    )
