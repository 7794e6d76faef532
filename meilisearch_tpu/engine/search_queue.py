"""Bounded search concurrency permits.

Reference: crates/meilisearch/src/search_queue.rs — CPU-count-sized permit
pool; requests that cannot obtain a permit within `drop_search_after`
receive a 503 `too_many_search_requests`.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from ..types.errors import EngineError, ErrorCode


class SearchQueue:
    def __init__(self, capacity: int | None = None, drop_after_s: float = 60.0):
        if capacity is None:
            capacity = max(os.cpu_count() or 2, 2)
        self.capacity = capacity
        self._sem = threading.BoundedSemaphore(capacity)
        self.drop_after_s = drop_after_s

    @contextmanager
    def permit(self):
        acquired = self._sem.acquire(timeout=self.drop_after_s)
        if not acquired:
            raise EngineError(
                ErrorCode.BAD_REQUEST,
                "Too many search requests running at the same time:"
                f" {self.capacity}. Retry after 10s.",
            )
        try:
            yield
        finally:
            self._sem.release()
