"""Sorted-array posting operations — the frozen snapshot's set algebra.

The mutable store keeps postings as Python sets (cheap fine-grained
del/add); queries read them as sorted int64 arrays cached per generation.
All per-query set algebra then runs as vectorized merges — the host-side
mirror of the device bitmap ops, and the layout the device snapshot uploads
as CSR.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

EMPTY = np.empty(0, dtype=np.int64)


def to_array(docids: Optional[set]) -> np.ndarray:
    if not docids:
        return EMPTY
    arr = np.fromiter(docids, dtype=np.int64, count=len(docids))
    arr.sort()
    return arr


def union_many(arrays: Iterable[np.ndarray]) -> np.ndarray:
    arrays = [a for a in arrays if len(a)]
    if not arrays:
        return EMPTY
    if len(arrays) == 1:
        return arrays[0]
    return np.unique(np.concatenate(arrays))


def intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sorted-unique intersection via binary search (faster than intersect1d
    for asymmetric sizes)."""
    if len(a) == 0 or len(b) == 0:
        return EMPTY
    if len(a) > len(b):
        a, b = b, a
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = 0
    return a[b[idx] == a]


def difference(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return a
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = 0
    return a[b[idx] != a]


def member_mask(candidates: np.ndarray, arr: np.ndarray) -> np.ndarray:
    """Membership of each candidate in the sorted array."""
    if len(arr) == 0 or len(candidates) == 0:
        return np.zeros(len(candidates), dtype=bool)
    idx = np.searchsorted(arr, candidates)
    idx[idx == len(arr)] = 0
    return arr[idx] == candidates


class CandidateIndex:
    """Dense docid -> candidate-slot map for repeated membership tests.

    A query computes O(#terms * #dims) membership masks against one fixed
    candidate array; a dense int32 lookup makes each mask O(|posting|)
    instead of O(n log |posting|) binary searches.
    """

    def __init__(self, candidates: np.ndarray, max_docid: int):
        self.candidates = candidates
        self.n = len(candidates)
        size = max(max_docid + 1, int(candidates[-1]) + 1 if self.n else 1)
        self.idx_of = np.full(size, -1, dtype=np.int32)
        if self.n:
            self.idx_of[candidates] = np.arange(self.n, dtype=np.int32)

    def mask(self, docids: np.ndarray) -> np.ndarray:
        out = np.zeros(self.n, dtype=bool)
        if len(docids) == 0 or self.n == 0:
            return out
        if docids[-1] >= len(self.idx_of):
            docids = docids[docids < len(self.idx_of)]
        slots = self.idx_of[docids]
        out[slots[slots >= 0]] = True
        return out


class ArrayCache:
    """Per-store-generation cache of set -> sorted-array conversions."""

    def __init__(self, store):
        self.store = store
        cache = getattr(store, "_posting_array_cache", None)
        if cache is None or cache[0] != store.generation:
            cache = (store.generation, {})
            store._posting_array_cache = cache
        self.cache: dict = cache[1]

    def get(self, key: tuple, docids_set: Optional[set]) -> np.ndarray:
        arr = self.cache.get(key)
        if arr is None:
            arr = to_array(docids_set)
            if len(self.cache) < 200_000:
                self.cache[key] = arr
        return arr
