"""Exact top-k selection built on the TPU's PartialReduce hardware op.

The scorer's two selection passes were the drain bottleneck at 1M docs:
`lax.top_k` / full sorts cost ~40-55 ms per (32, 2^20) pass on the
tunneled v5e while `lax.approx_min_k` with `aggregate_to_topk=False`
(one PartialReduce) costs ~0.35 ms — the hardware keeps a running
top-1 per shard of the input. This module turns that approximate op
into an EXACT selection:

  * int keys map to float32 by an order-exact injective bitcast
    (`bitcast(v + 2^23)`: patterns stay normal finite floats, integer
    order == float order), so approx passes never lose precision;
  * r peeled rounds: after each round, the returned element of every
    shard is masked to +inf via a pure broadcast (no scatter) using the
    op's shard layout, so round j returns each shard's j-th best —
    a true top-k member can only be missed if >r of the winners share
    one shard (P ~ 1e-4 per query at r=4, l=16384, k=1024);
  * an exact validation count per query: `count(key < kth)` over the
    full plane must equal the candidate coverage. Any miss — including
    a wrong shard-layout guess on a future backend — flags the query
    for the host scorer instead of returning a wrong page.

The shard layout is reverse-engineered per (B, D, l) shape by a
one-call probe on a permutation (`probe_layout`): G groups of D/G
contiguous elements, strided mod l/G within a group (measured: G=8 at
B<=8, D=2^20; G=B at B>=16 — i.e. ~2^20 elements per PartialReduce
invocation). A probe mismatch returns None and the caller falls back
to the top_k selection path. `optimization_barrier` before every
approx call is REQUIRED: letting XLA fuse the operand computation into
PartialReduce breaks tie-index slot alignment (measured 1016/16384
aligned fused vs 16384/16384 barriered), which the index-peel needs.

Contract parity target: the two-pass top_k selection of
arena_scorer._planes_chain_topk_fused (reference semantics:
bucket_sort.rs:23 ordering; the kth tie class ordered by
(quantized sort rank, docid) as merge_topk_sort_host expects).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

INVALID = 1 << 30
_BIAS = 1 << 23
# peeled elements become this pattern: sorts after INVALID, still finite
_INF_F = np.int32(INVALID + _BIAS + 1).view(np.float32)


def _f32_mono(v):
    """Order-exact injective int32 -> float32 for 0 <= v <= 2^30."""
    return jax.lax.bitcast_convert_type(v + jnp.int32(_BIAS), jnp.float32)


def _mono_inv(f):
    return jax.lax.bitcast_convert_type(f, jnp.int32) - jnp.int32(_BIAS)


@functools.lru_cache(maxsize=None)
def probe_layout(B: int, D: int, k: int, rt: float):
    """Infer the PartialReduce shard layout for this (B, D, l) shape:
    one probe call on a shared permutation, then test candidate G values
    for perfect slot alignment. Returns (G, l) — group count and the
    op's oversampled output width — or None, in which case the caller
    must not use the approx path for this shape."""
    try:
        rng = np.random.default_rng(0)
        vals = rng.permutation(D).astype(np.float32)
        arr = jnp.asarray(np.broadcast_to(vals, (B, D)).copy())

        @jax.jit
        def one(x):
            x = jax.lax.optimization_barrier(x)
            return jax.lax.approx_min_k(
                x, k, recall_target=rt, aggregate_to_topk=False
            )

        _, i = one(arr)
        i = np.asarray(i)
        l = i.shape[-1]
        if D % l:
            return None
        for G in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            if l % G or D % G:
                continue
            C = l // G
            sh = (i[0] % C) + C * (i[0] // (D // G))
            if np.array_equal(sh, np.arange(l)):
                return G, l
        return None
    except Exception:
        return None


def emulate_partial_reduce(G: int, l: int, D: int):
    """CPU stand-in for `approx_min_k(…, aggregate_to_topk=False)` with
    the probed TPU shard layout: positions partition into l shards (G
    groups of D/G contiguous positions, strided mod l/G within a group);
    slot j returns shard j's running minimum and its position. Pure JAX —
    lets tests exercise the peel/validation/decode logic without TPU
    hardware (the hardware probe itself stays hardware-only)."""
    C = l // G
    depth = D // l

    def reduce_fn(x, k, rt):
        B = x.shape[0]
        xr = x.reshape(B, G, depth, C)
        v = jnp.min(xr, axis=2)
        dep = jnp.argmin(xr, axis=2).astype(jnp.int32)
        g = jnp.arange(G, dtype=jnp.int32)[None, :, None]
        c = jnp.arange(C, dtype=jnp.int32)[None, None, :]
        pos = g * (D // G) + dep * C + c
        return v.reshape(B, l), pos.reshape(B, l)

    return reduce_fn


def _hw_reduce(x, k, rt):
    x = jax.lax.optimization_barrier(x)
    return jax.lax.approx_min_k(x, k, recall_target=rt, aggregate_to_topk=False)


def _peel_select(
    f, k: int, rt: float, rounds: int, D: int, G: int, l: int, reduce_fn=None
):
    """f: (B, D) bitcast-mono float32. Returns (idx (B, k), val (B, k) int,
    cand_v (B, rounds*l) int): the k smallest values (ties arbitrary) plus
    every candidate the rounds surfaced (disjoint elements by construction,
    so validation can count them without dedup). `reduce_fn` defaults to
    the hardware PartialReduce; tests inject `emulate_partial_reduce`.

    Shard-interleave: the op partitions POSITIONS into l shards (G groups
    of D/G contiguous, strided mod l/G within a group), so winners that
    cluster in a narrow position range (e.g. the lowest-docid members of
    a huge tie class in pass 2 — measured 5/15 production queries flagged)
    land on only l/G shards and overflow the r-deep peel. A tiled
    reshape/transpose (no gather) re-lays element d at a position whose
    shard is exactly d mod l, spreading any position-clustered winner set
    across ALL l shards; indices map back arithmetically."""
    if reduce_fn is None:
        reduce_fn = _hw_reduce
    B = f.shape[0]
    C = l // G
    depth = D // l
    # element d = (dep*l + g*C + c) -> position p' = g*(D//G) + dep*C + c,
    # whose shard is c + C*g = d mod l
    f = f.reshape(B, depth, G, C).transpose(0, 2, 1, 3).reshape(B, D)
    cands_v, cands_i = [], []
    for r in range(rounds):
        v, i = reduce_fn(f, k, rt)
        cands_v.append(v)
        cands_i.append(i)
        if r + 1 < rounds:
            # broadcast each slot's returned index back over its shard's
            # positions and mask exactly that element (no scatter)
            ib = i.reshape(B, G, 1, C)
            pos = jnp.arange(D, dtype=i.dtype).reshape(1, G, depth, C)
            peel = (ib == pos).reshape(B, D)
            f = jnp.where(peel, jnp.float32(_INF_F), f)
    cv = jnp.concatenate(cands_v, axis=1)
    ci = jnp.concatenate(cands_i, axis=1).astype(jnp.int32)
    # transposed position p' -> original element index d
    g = ci // (D // G)
    off = ci % (D // G)
    ci = (off // C) * l + g * C + (off % C)
    negv, sel = jax.lax.top_k(-cv, k)
    idx = jnp.take_along_axis(ci, sel, axis=1)
    return idx, _mono_inv(-negv), _mono_inv(cv)


def select_approx(
    keys,
    sel_key,
    qsort,
    k: int,
    rt: float,
    rounds: int,
    G: int,
    l: int,
    reduce_fn=None,
):
    """Both selection passes on PartialReduce. Returns
    (idx1, key1, idx2, key2, exact) matching the top_k contract:
      idx1/key1: the k smallest sel_key docs (all docs strictly below the
                 kth value are present when exact), full keys gathered;
      idx2/key2: the kth tie class's (qsort, docid)-ordered prefix;
      exact:     (B,) int32 — 2 when both passes validated exact, 1 when
                 only pass 1 did (every strictly-below-kth doc is present
                 and correctly ordered, but the kth tie class may be
                 missing members: pages inside the below-kth prefix are
                 servable, pages touching the tie class are not), 0 when
                 even pass 1 is unproven (host re-run required)."""
    B, D = keys.shape
    sh = max((D - 1).bit_length(), 1)

    f = _f32_mono(sel_key)
    idx1, val1, cv1 = _peel_select(f, k, rt, rounds, D, G, l, reduce_fn)
    kth = val1[:, k - 1]
    n_lt = jnp.sum((sel_key < kth[:, None]).astype(jnp.int32), axis=1)
    c_lt = jnp.sum((cv1 < kth[:, None]).astype(jnp.int32), axis=1)
    exact1 = n_lt == c_lt
    key1 = jnp.take_along_axis(keys, idx1, axis=1)

    # pass 2: the kth tie class ordered by (qsort, docid). The composite
    # value ENCODES both, so indices decode from values (no gather) and
    # all values are distinct (docid bits) — peeling is tie-safe.
    iota = jnp.arange(D, dtype=jnp.int32)[None, :]
    comp = (qsort << sh) | iota
    t = jnp.where(sel_key == kth[:, None], comp, jnp.int32(INVALID))
    idx2r, val2, cv2 = _peel_select(
        _f32_mono(t), k, rt, rounds, D, G, l, reduce_fn
    )
    kth2 = val2[:, k - 1]
    n_lt2 = jnp.sum((t < kth2[:, None]).astype(jnp.int32), axis=1)
    c_lt2 = jnp.sum((cv2 < kth2[:, None]).astype(jnp.int32), axis=1)
    exact2 = n_lt2 == c_lt2

    in_class = val2 < jnp.int32(INVALID)
    idx2 = jnp.where(in_class, val2 & ((1 << sh) - 1), 0)
    key2 = jnp.where(
        in_class,
        jnp.take_along_axis(keys, idx2, axis=1),
        jnp.int32(INVALID),
    )
    # kth == INVALID means the query has < k candidates: they are all
    # strictly below kth, so pass 1's validation alone proves the page
    # (pass 2 "selected" among dead docs, which the host merge filters
    # by key >= INVALID) — don't let dead-doc shard collisions flag it
    full = exact2 | (kth == jnp.int32(INVALID))
    exact = jnp.where(
        exact1, jnp.where(full, jnp.int32(2), jnp.int32(1)), jnp.int32(0)
    )
    return idx1.astype(jnp.int32), key1, idx2.astype(jnp.int32), key2, exact


def approx_rt() -> float:
    return float(os.environ.get("MEILI_TPU_APPROX_RT", "0.9"))


def approx_rounds() -> int:
    return int(os.environ.get("MEILI_TPU_APPROX_ROUNDS", "4"))
