"""Device-resident batched typo matching: the OSA distance DP over the
WHOLE vocabulary as one device execute.

Host counterpart: ops/levenshtein.py (numpy, differentially tested
against it). The reference intersects per-word Levenshtein DFAs with an
FST (milli search/mod.rs:565 build_dfa); the TPU-native form is a
data-parallel DP over a packed (n_words, MAX_LEN) codepoint matrix that
lives in HBM per store generation — a textbook VPU workload: every DP
cell is an elementwise select/min over n-wide vectors.

Design points (same playbook as ops/arena_scorer.py):
  * ONE compiled program per vocabulary-size bucket: n pads to the next
    power of two, the query pads to MAX_LEN and the char loop masks
    iterations beyond its true length — query length never recompiles.
  * int16 DP state: 3 x (n, MAX_LEN+1) rows ~ 200 MB at a 1M-word
    vocabulary, well inside HBM; values are bounded by i + j <= 64.
  * one output pair (full, prefix_min) as int8 — a 2 MB readback at 1M
    words vs the host pass's ~1.7 s/term (measured, warm pools).

The host pass stays as the fallback (no device, small vocabularies,
compile not warm yet) and as the differential oracle.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

from .jax_setup import configure_jax
from .levenshtein import INF, MAX_LEN

configure_jax()

# crossover: the device execute costs a ~0.35 s tunnel round trip flat,
# the host pass scales with vocabulary (~1.7 s at 1M words, ~0.1 s at
# 100k) — below ~0.5M words the host wins
MIN_DEVICE_VOCAB = 1 << 19


def _vocab_bucket(n: int) -> int:
    return max(1 << (n - 1).bit_length(), 1024)


@functools.partial(
    __import__("jax").jit, static_argnames=("n", "max_dist")
)
def osa_device(dict_mat, dict_lens, q, m, n: int, max_dist: int):
    """full[i], prefix_min[i] for every dictionary word, padded width.

    dict_mat: (n, MAX_LEN) int32 codepoints (0-padded rows)
    dict_lens: (n,) int32 clamped lengths (0 = padding row)
    q: (MAX_LEN,) int32 query codepoints (0-padded)
    m: () int32 true query length (<= MAX_LEN)
    """
    import jax
    import jax.numpy as jnp

    L = MAX_LEN
    big = jnp.int16(INF)
    col = jnp.arange(L + 1, dtype=jnp.int16)[None, :]

    init_prev = jnp.broadcast_to(col, (n, L + 1)).astype(jnp.int16)
    init_prev2 = jnp.zeros((n, L + 1), jnp.int16)
    # final-row snapshot, taken at i == m
    init_final = jnp.broadcast_to(col, (n, L + 1)).astype(jnp.int16)

    def body(i, carry):
        prev2, prev, final = carry
        active = i < m
        qc = q[i]
        qp = q[jnp.maximum(i - 1, 0)]
        sub_cost = (dict_mat != qc).astype(jnp.int16)
        del_ = prev[:, 1:] + jnp.int16(1)
        sub = prev[:, :-1] + sub_cost
        best = jnp.minimum(del_, sub)
        trans_ok = jnp.zeros((n, L), dtype=bool)
        trans_ok = trans_ok.at[:, 1:].set(
            (dict_mat[:, 1:] == qp) & (dict_mat[:, :-1] == qc) & (i >= 1)
        )
        trans = jnp.where(
            trans_ok,
            jnp.concatenate(
                [
                    jnp.full((n, 1), big, jnp.int16),
                    prev2[:, :-2] + jnp.int16(1),
                ],
                axis=1,
            ),
            big,
        )
        best = jnp.minimum(best, trans)
        # cur[j] = min(best[j], cur[j-1] + 1) via a running prefix-min:
        # cur[j] = min over k <= j of (base[k] + (j - k))
        cur0 = jnp.full((n, 1), i + 1, jnp.int16)
        base = jnp.concatenate([cur0, best], axis=1) - col
        shifted = jax.lax.cummin(base, axis=1)
        cur = shifted + col
        cur = cur.at[:, 0].set(jnp.int16(i + 1))
        prev2, prev = prev, jnp.where(active, cur, prev)
        # prev2 must also freeze once inactive (it lags by one row)
        prev2 = jnp.where(active, prev2, carry[0])
        final = jnp.where(i + 1 == m, prev, final)
        return prev2, prev, final

    _, _, final = jax.lax.fori_loop(
        0, L, body, (init_prev2, init_prev, init_final)
    )

    jidx = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :]
    valid_j = jidx <= dict_lens[:, None]
    full = jnp.take_along_axis(
        final, dict_lens[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    full = jnp.where(dict_lens == 0, jnp.int16(9999), full)
    row_masked = jnp.where(valid_j, final[:, 1:], big)
    prefix_min = jnp.minimum(jnp.min(row_masked, axis=1), full)
    prefix_min = jnp.where(
        m <= max_dist, jnp.minimum(prefix_min, m.astype(jnp.int16)), prefix_min
    )
    cap = jnp.int16(max_dist + 1)
    return (
        jnp.minimum(full, cap).astype(jnp.int8),
        jnp.minimum(prefix_min, cap).astype(jnp.int8),
    )


class DeviceVocab:
    """Per-(store, base vocabulary) resident matrix + lens."""

    def __init__(self, mat: np.ndarray, lens: np.ndarray):
        import jax.numpy as jnp

        self.n_real = len(lens)
        self.n = _vocab_bucket(self.n_real)
        pad = self.n - self.n_real
        if pad:
            mat = np.pad(mat, ((0, pad), (0, 0)))
            lens = np.pad(lens, (0, pad))
        self.mat = jnp.asarray(mat)
        self.lens = jnp.asarray(lens.astype(np.int32))


def get_device_vocab(store, mat, lens) -> Optional["DeviceVocab"]:
    # keyed by the packed matrix's identity (kept alive in the entry): the
    # BASE vocabulary is stable across minor writes (store.VocabSnapshot),
    # so the resident upload survives them; a promotion swaps the matrix
    # object and re-uploads once
    cached = getattr(store, "_device_vocab", None)
    if cached is not None and cached[0] is mat:
        return cached[1]
    dv = DeviceVocab(mat, lens)
    store._device_vocab = (mat, dv)
    return dv


_READY: dict = {}


def _warm_bucket(n: int) -> bool:
    """Async compile for the vocabulary bucket; True once ready. A cold
    compile costs 30-300 s over the tunnel and must never land on the
    serving path (policy of device_batch.warm_kernels)."""
    key = (n, 2)
    state = _READY.get(key)
    if state == "ready":
        return True
    if state == "pending":
        return False
    _READY[key] = "pending"

    def go():
        try:
            import jax.numpy as jnp

            out = osa_device(
                jnp.zeros((n, MAX_LEN), jnp.int32),
                jnp.zeros((n,), jnp.int32),
                jnp.zeros((MAX_LEN,), jnp.int32),
                jnp.int32(1),
                n=n,
                max_dist=2,
            )
            np.asarray(out[0])
            _READY[key] = "ready"
        except Exception:
            _READY.pop(key, None)  # retry on the next trigger

    import threading

    threading.Thread(target=go, name=f"osa-warm-{n}", daemon=True).start()
    return False


def device_osa_available(store, n_words: int) -> bool:
    """Gate: device present, vocabulary large enough for the execute to
    beat the host pass, kernel compiled for this bucket."""
    strict = os.environ.get("MEILI_TPU_DEVICE_STRICT") == "1"
    if os.environ.get("MEILI_TPU_DEVICE_OSA", "1") != "1":
        return False
    if n_words < MIN_DEVICE_VOCAB and not strict:
        return False
    from .backend_probe import backend_kind

    kind = backend_kind()
    if kind in (None, "", "cpu") and not strict:
        # no device, a pending probe, or a backend whose init hung (dead
        # tunnel) — fail-fast/non-blocking so a broken accelerator
        # degrades to the host pass instead of wedging every typo query
        return False
    if strict:
        return True  # tests: compile on demand (CPU compiles fast)
    return _warm_bucket(_vocab_bucket(max(n_words, 1)))


def osa_distances_device(store, mat, lens, query: str, max_dist: int = 2):
    """Drop-in for levenshtein.osa_distances over the full vocabulary,
    returning numpy (full, prefix_min) clipped to max_dist + 1."""
    import jax.numpy as jnp

    dv = get_device_vocab(store, mat, lens)
    q = np.zeros(MAX_LEN, dtype=np.int32)
    cps = [ord(c) for c in query[:MAX_LEN]]
    q[: len(cps)] = cps
    m = min(len(query), MAX_LEN)
    full, prefix = osa_device(
        dv.mat,
        dv.lens,
        jnp.asarray(q),
        jnp.int32(m),
        n=dv.n,
        max_dist=max_dist,
    )
    full = np.asarray(full)[: dv.n_real].astype(np.int32)
    prefix = np.asarray(prefix)[: dv.n_real].astype(np.int32)
    return np.minimum(full, max_dist + 1), np.minimum(prefix, max_dist + 1)
