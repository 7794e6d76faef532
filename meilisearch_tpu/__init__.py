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
