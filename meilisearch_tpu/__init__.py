"""meilisearch_tpu — a TPU-native search engine with Meilisearch capabilities.

Built from scratch against the behavior of meilisearch/meilisearch (reference
mounted read-only at /root/reference). The compute core — term matching with
typo tolerance, posting-list algebra, ranking, facet counting, vector search —
runs as batched JAX/XLA/Pallas programs over immutable device-resident index
snapshots; the host side (tokenization, index build orchestration, HTTP API,
task scheduling) mirrors the reference's engine shell.

Layer map (reference parity, see SURVEY.md):
  L1/L2  meilisearch_tpu.api      — HTTP server + routes
  L3     meilisearch_tpu.engine   — task queue, scheduler, index registry
  L4     meilisearch_tpu.types    — settings/tasks/error DTOs
  L5     meilisearch_tpu.index,
         meilisearch_tpu.search,
         meilisearch_tpu.build,
         meilisearch_tpu.vector   — the milli equivalent
  L6     meilisearch_tpu.ops      — device kernels (bitsets, levenshtein, top-k)
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large heap blocks pooled instead of mmap'd per allocation.

    On lazily-backed VM memory (Firecracker and friends), every fresh
    mmap'd page faults in at single-digit MB/s while rewrites of touched
    pages run at GB/s — measured here: a 200 MB numpy copy costs 24 s on
    first-touch pages vs 0.15 s into reused ones. glibc malloc mmaps (and
    munmaps!) every block over 128 KB, so each large numpy temporary pays
    first-touch again. Raising the mmap/trim thresholds turns those into
    heap reuse. No-op on non-glibc platforms."""
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass


_tune_malloc()
