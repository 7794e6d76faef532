"""Device posting-construction passes (SURVEY §7 P1: "device segmented
sort + run-length reduce into postings").

The reference builds postings with rayon hash-partitioned caches and a
grenad merge (update/new/extract/cache.rs:1-60); the TPU-native
formulation is data-parallel: the host tokenizer emits flat
(key, docid) tuple streams, the device sorts them (one `lax.sort`
two-key pass — the TPU's bitonic sort at memory bandwidth), deduplicates
adjacent repeats, and emits run-length segment boundaries; the host then
slices each key's sorted docid segment zero-copy into a Posting
(index/arrays.py add_segment), exactly like the C++ builder's output
(native/posting_builder.cpp).

On THIS rig the tunnel makes the device pass a wash for indexing (a
~27 ms round trip + ~25-70 MB/s readback per batch vs an in-process
C++ sort), so the C++ builder stays the default; the pass exists for
co-located deployments where the chip is idle during ingest and the
sort/reduce is free compute. The parity suite (tests/test_device_build.py)
pins the device output byte-identical to the host builder on real
corpora, so flipping MEILI_TPU_DEVICE_BUILD=1 is a pure transport
decision.
"""

from __future__ import annotations

import numpy as np

from .jax_setup import configure_jax

configure_jax()


@__import__("jax").jit
def _sorted_runs(keys, docids):
    """Sort (key, docid) pairs and mark first occurrences — the device
    half of the pass (bandwidth-bound bitonic sort, no scatter). Run
    lengths reduce host-side over the already-sorted stream (np.diff over
    boundaries — C speed, no per-element Python)."""
    import jax
    import jax.numpy as jnp

    s_keys, s_docs = jax.lax.sort((keys, docids), num_keys=2)
    same = jnp.concatenate(
        [
            jnp.zeros(1, bool),
            (s_keys[1:] == s_keys[:-1]) & (s_docs[1:] == s_docs[:-1]),
        ]
    )
    return s_keys, s_docs, ~same


def device_build_postings(keys: np.ndarray, docids: np.ndarray):
    """(key, docid) tuple stream -> per-key sorted unique docid segments.

    Returns (key_ids, lens, concat_docids): key_ids ascending with kept
    keys only, lens aligned, concat_docids the concatenation of each
    key's ascending unique docids — the same contract as the native
    builder's per-table output (analysis/native.py)."""
    if len(keys) == 0:
        return (
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int64),
        )
    s_keys, s_docs, keep = _sorted_runs(
        np.asarray(keys, np.int32), np.asarray(docids, np.int32)
    )
    kk = np.asarray(s_keys)[np.asarray(keep)]
    kd = np.asarray(s_docs)[np.asarray(keep)]
    starts = np.flatnonzero(
        np.concatenate([np.ones(1, bool), kk[1:] != kk[:-1]])
    )
    lens = np.diff(np.concatenate([starts, [len(kk)]]))
    return (
        kk[starts].astype(np.int32),
        lens.astype(np.int32),
        kd.astype(np.int64),
    )


def device_build_pair_postings(
    w1: np.ndarray, w2: np.ndarray, prox: np.ndarray, docids: np.ndarray,
    n_words: int,
):
    """Pair-proximity stream -> per-(prox, w1, w2) segments, keeping the
    MINIMUM proximity per (pair, doc) — the extractor's dedup rule
    (extract_word_pair_proximity_docids.rs: minimal proximity wins).

    The device sorts (pair, doc, prox) three-key, so the first row of
    each (pair, doc) run carries the minimal proximity; the host then
    regroups the deduped stream by (prox, pair). Returns (combo, lens,
    concat_docids) with combo = prox * n_words^2 + w1 * n_words + w2."""
    import jax

    if len(w1) == 0:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int32),
            np.zeros(0, np.int64),
        )
    pair_key = (
        w1.astype(np.int64) * np.int64(n_words) + w2.astype(np.int64)
    )
    # sort by (pair, doc, prox): first of each (pair, doc) run = min prox
    s_pair, s_doc, s_prox = map(
        np.asarray,
        jax.lax.sort(
            (
                pair_key.astype(np.int64),
                docids.astype(np.int32),
                prox.astype(np.int32),
            ),
            num_keys=3,
        ),
    )
    first = np.concatenate(
        [
            np.ones(1, bool),
            (s_pair[1:] != s_pair[:-1]) | (s_doc[1:] != s_doc[:-1]),
        ]
    )
    kp, kd, kx = s_pair[first], s_doc[first], s_prox[first]
    # regroup by (prox, pair): one more host lexsort over the deduped
    # stream (already tiny relative to the raw pair stream)
    order = np.lexsort((kd, kp, kx))
    kp, kd, kx = kp[order], kd[order], kx[order]
    group = np.concatenate(
        [np.ones(1, bool), (kp[1:] != kp[:-1]) | (kx[1:] != kx[:-1])]
    )
    starts = np.flatnonzero(group)
    lens = np.diff(np.concatenate([starts, [len(kp)]]))
    combo = kx[starts].astype(np.int64) * np.int64(n_words) * np.int64(
        n_words
    ) + kp[starts]
    return combo, lens.astype(np.int32), kd.astype(np.int64)
