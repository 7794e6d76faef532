"""Vector store: MXU-tiled exact nearest-neighbor search.

Reference behavior: milli/src/vector/store.rs — arroy (random-projection
trees) / hannoy (HNSW) ANN over LMDB, with a linear-scan fallback below
300k items or <10% filter ratio (store.rs:22-27).

TPU-native design: ANN graph walks are pointer-chasing and hostile to the
MXU; an exact batched dot-product top-k is *faster* on TPU for corpora that
fit HBM and gives recall 1.0 (SURVEY.md §7 P4). Vectors are packed into an
(n_padded, dim) bf16/f32 device matrix per (embedder, index generation);
search is one matmul + top_k. IVF partitioning slots in at the 10M+ scale
(future work; the API here stays the same).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..index.store import IndexStore


class VectorSearcher:
    """Per-(index, embedder) device-resident exact search."""

    def __init__(self, store: IndexStore, embedder: str):
        self.store = store
        self.embedder = embedder
        # cached on the store itself (an id(store)-keyed global dict would
        # serve stale matrices when a freed store's id is reused)
        caches = getattr(store, "_vector_searcher_cache", None)
        if caches is None:
            caches = {}
            store._vector_searcher_cache = caches
        cached = caches.get(embedder)
        if cached and cached[0] == store.generation:
            self.docids, self.matrix, self.norms = cached[1]
            return
        per_doc = store.vectors.get(embedder, {})
        conf = store.settings.embedders.get(embedder, {})
        quantized = bool(conf.get("binaryQuantized"))
        self.quantized = quantized
        docids = []
        rows = []
        for docid in sorted(per_doc):
            for row in per_doc[docid]:
                docids.append(docid)
                rows.append(row)
        self.docids = np.asarray(docids, dtype=np.int64)
        if rows:
            self.matrix = np.stack(rows).astype(np.float32)
            if quantized:
                # binary quantization: keep only the sign bits
                # (reference: vector/store.rs hamming over quantized vectors)
                self.matrix = np.where(self.matrix >= 0, 1.0, -1.0).astype(
                    np.float32
                )
        else:
            self.matrix = np.zeros((0, 0), dtype=np.float32)
        norms = np.linalg.norm(self.matrix, axis=1) if len(rows) else np.zeros(0)
        norms[norms == 0] = 1.0
        self.norms = norms
        caches[embedder] = (
            store.generation,
            (self.docids, self.matrix, self.norms),
        )

    def dimension(self) -> Optional[int]:
        if self.matrix.size == 0:
            return None
        return self.matrix.shape[1]

    def search(
        self,
        query: np.ndarray,
        k: int,
        universe: Optional[set] = None,
        use_device: bool = True,
    ) -> list[tuple[int, float]]:
        """Top-k by cosine similarity. Returns [(docid, similarity)] with
        similarity = (1+cos)/2 in [0,1] (the arroy cosine-distance
        complement, vector_sort.rs:86 `1.0 - distance`)."""
        if self.matrix.size == 0:
            return []
        q = np.asarray(query, dtype=np.float32)
        if getattr(self, "quantized", False):
            q = np.where(q >= 0, 1.0, -1.0).astype(np.float32)
        qn = np.linalg.norm(q)
        if qn == 0:
            qn = 1.0
        if use_device and self.matrix.shape[0] >= 4096:
            cos = _device_cosine(self.matrix, self.norms, q / qn)
        else:
            cos = (self.matrix @ (q / qn)) / self.norms
        sims = (1.0 + cos) / 2.0

        if universe is not None:
            if not isinstance(universe, np.ndarray):
                universe = (
                    np.fromiter(universe, dtype=np.int64, count=len(universe))
                    if universe
                    else np.empty(0, dtype=np.int64)
                )
            if len(universe):
                keep = np.isin(self.docids, universe)
            else:
                keep = np.zeros(len(self.docids), dtype=bool)
            sims = np.where(keep, sims, -np.inf)

        # multiple vectors per doc: keep the best one
        order = np.argsort(-sims, kind="stable")
        out = []
        seen = set()
        for i in order:
            if sims[i] == -np.inf:
                break
            docid = int(self.docids[i])
            if docid in seen:
                continue
            seen.add(docid)
            out.append((docid, float(np.clip(sims[i], 0.0, 1.0))))
            if len(out) >= k:
                break
        return out


_device_fn_cache = {}


def _device_cosine(matrix: np.ndarray, norms: np.ndarray, unit_query: np.ndarray):
    """MXU path: one jitted matmul over the padded device matrix."""
    import jax
    import jax.numpy as jnp

    key = matrix.shape
    fn = _device_fn_cache.get(key)
    if fn is None:

        @jax.jit
        def fn(m, n, q):
            return jnp.dot(m, q, preferred_element_type=jnp.float32) / n

        _device_fn_cache[key] = fn
    return np.asarray(fn(matrix, norms, unit_query))
