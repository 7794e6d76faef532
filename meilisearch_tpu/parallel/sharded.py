"""Multi-chip scatter-gather search over a device mesh.

Reference equivalent: EE sharding + federated `/multi-search`
(crates/milli/src/sharding/enterprise_edition.rs — rendezvous-hash docid
assignment; crates/meilisearch/src/search/federated/perform.rs — HTTP
scatter-gather merge of per-shard top-ks).

TPU-native design (SURVEY.md §2.6): documents are sharded across chips by
docid; every chip runs the SAME fused scoring program on its local shard
(pure elementwise work — zero communication), computes a local top-k, and
one `all_gather` over ICI moves the (sort-key, docid) tuples — fixed-width,
tiny — to every chip where a final sort yields the global top-k. One jitted
program, no HTTP in the hot path; the HTTP federation layer remains for
cross-pod (DCN) scatter-gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.device_scorer import chain_query_topk


def make_mesh(n_devices: int | None = None, axis: str = "shards") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def sharded_query_topk(mesh: Mesh, inputs: tuple, k: int = 10):
    """Run the fused chain-query scorer over docid shards and merge top-ks.

    inputs = (class_mask (T,3,N), pair_cost, fid_cost, pos_cost, exact_mask,
              docids (N,), valid (N,)) with N divisible by the mesh size.
    """
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    axis = mesh.axis_names[0]

    def local_step(class_mask, pair_cost, fid_cost, pos_cost, exact_mask, docids, valid):
        docs, hi, lo = chain_query_topk(
            class_mask, pair_cost, fid_cost, pos_cost, exact_mask, docids,
            valid, k=k,
        )
        # all-gather the fixed-width (key, docid) tuples over ICI
        all_docs = jax.lax.all_gather(docs, axis)  # (n_shards, k)
        all_hi = jax.lax.all_gather(hi, axis)
        all_lo = jax.lax.all_gather(lo, axis)
        flat_docs = all_docs.reshape(-1)
        flat_hi = all_hi.reshape(-1)
        flat_lo = all_lo.reshape(-1)
        s_hi, s_lo, s_docs = jax.lax.sort(
            (flat_hi, flat_lo, flat_docs), num_keys=2
        )
        # every shard holds the same merged copy; emitting it per-shard
        # keeps the output spec trivially shardable (host slices [:k])
        return s_docs[:k], s_hi[:k]

    shard = P(None, None, axis)  # (T, 3, N) sharded on N
    specs = (
        shard,  # class_mask
        P(None, None, None, axis),  # pair_cost
        shard,  # fid_cost
        shard,  # pos_cost
        P(None, axis),  # exact_mask
        P(axis),  # docids
        P(axis),  # valid
    )
    out_specs = (P(axis), P(axis))

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=specs,
        out_specs=out_specs,
    )
    docs, hi = jax.jit(fn)(*inputs)
    k_out = docs.shape[0] // mesh.devices.size
    return docs[:k_out], hi[:k_out]


def rendezvous_shard(doc_key: str, shard_names: list[str]) -> str:
    """Rendezvous hashing of a document to a shard
    (reference: sharding/enterprise_edition.rs:43 — highest hash wins)."""
    import hashlib

    best = None
    for name in shard_names:
        h = hashlib.sha256((name + "\0" + doc_key).encode()).digest()
        score = int.from_bytes(h[:8], "big")
        if best is None or score > best[0]:
            best = (score, name)
    return best[1]
