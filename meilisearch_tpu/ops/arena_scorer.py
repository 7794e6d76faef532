"""Plane-resident batched ranking: B chain queries, ONE execute, dense
row reads only.

Design forced by measurement on the tunneled v5e (see git history for the
raw numbers):

  * every execute costs a fixed ~28 ms -> batch queries;
  * random gather/scatter runs at ~270 ns/element while dense rows stream
    at HBM bandwidth -> posting structures live as dense per-document
    planes (bitmap rows for masks, int8 rows for costs), built once on
    host per (generation, structure) and resident thereafter
    (index/device_arena.py);
  * a full-axis sort costs 0.1-10 s, lax.top_k rides under the dispatch
    floor -> the rank key packs into one int32 and top_k picks the page,
    a second top_k resolving the kth-key tie class exactly;
  * a cold XLA compile costs 30-290 s over the tunnel -> the NUMBER OF
    COMPILED VARIANTS is itself a first-order cost. Round-2 lesson
    (BENCH run with ladders): pow4 pool-capacity growth x fresh-row
    buckets x {2,4,6} T-ladder x {8,32} B-ladder produced dozens of
    variants and compile time swamped serving. This version compiles ONE
    scoring program per corpus-size bucket: B and T are fixed at their
    maxima (padding is cheap — the kernel is dispatch/bandwidth bound,
    not FLOPs bound), pool capacities are fixed per D (index/device_arena
    flushes and re-registers rows if ever full), and row appends moved to
    a separate trivial kernel so the scorer's shapes never change.

The per-query descriptor is a handful of row indices in fixed-shape
matrices — a few hundred bytes of host->device traffic per query. Filter
universes ride as packed (B, D/32) bitmap inputs (a few hundred KB),
NOT as pool rows: transient rows were the other recompile source. The
ranking semantics are the `last`-strategy suffix DP shared with
ops/batch_scorer (_chain_dp), pinned by tests/golden and the 3-way
ranking fuzz; parity target is search/new/bucket_sort.rs:23 ordering at
graph_based_ranking_rule.rs:220 fidelity.

Byte-plane value conventions (host side: index/device_arena.byte_plane):
  pair rows: min proximity cost per (left-class, right-class), fill 3
  fid rows:  min field weight, fill -1 (= INF)
  pos rows:  min position cost, fill -1 (= INF)
  ea rows:   ExactAttribute rank 0/1 per words level, fill 2
Row 0 of the byte pool is all -1 and row 0 of the bit pool is all zero,
so "structure absent" is just row index 0 (the kernel maps -1 under pair
to 3 and under ea to 2 for that case).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .jax_setup import configure_jax

configure_jax()

INF32 = jnp.int32(1 << 24)
INF16 = jnp.int16(20000)
TOPK = 1024


def _key_layout(T: int):
    """Bit layout of the packed rank key for chain length T. The DP itself
    runs over this packed key (integer min == lexicographic min when every
    field is wide enough for its accumulated bound): words(T via skips),
    typo(2T), proximity(3(T-1)), fid(7T), position(10T), a 2-bit gap where
    the ExactAttribute rank lands AFTER the DP (it depends on the final
    words level), exactness(T). Total <= 29 bits for T <= 6."""
    ex_b = (T + 1).bit_length()
    ps_b = (10 * T + 1).bit_length()
    fd_b = (7 * T + 1).bit_length()
    px_b = max((3 * (T - 1) + 1).bit_length(), 1)
    ty_b = (2 * T + 1).bit_length()
    w_b = (T + 1).bit_length()
    sh_ea = ex_b
    sh_ps = sh_ea + 2
    sh_fd = sh_ps + ps_b
    sh_px = sh_fd + fd_b
    sh_ty = sh_px + px_b
    sh_w = sh_ty + ty_b
    total = sh_w + w_b
    assert total <= 29, (T, total)
    return sh_ea, sh_ps, sh_fd, sh_px, sh_ty, sh_w, total


def _packed_chain_dp(class_mask, pair_cost, fid_cost, pos_cost, exact_mask, T, D):
    """`last`-strategy suffix DP over ONE packed int32 key per state —
    6x less state traffic than the 6-row cost-matrix DP and a plain
    jnp.minimum instead of a 6-pass lexicographic min. Semantics are
    batch_scorer._chain_dp's: states [cls0, cls1, cls2, skip], a visit may
    only follow a visit (or START at t=0), the skip state absorbs all and
    never feeds back.

    fid/pos bytes are clamped to their per-step bounds (7 / 10): the host
    builder guarantees a doc inside class_mask always has fid and position
    postings for that (term, class) — the -1 'absent' sentinel only ever
    applies to docs the class_mask where() already invalidates."""
    sh_ea, sh_ps, sh_fd, sh_px, sh_ty, sh_w, total = _key_layout(T)
    BIG = jnp.int32(1 << total)  # invalid-state sentinel (> any valid key)

    states = [BIG * jnp.ones((D,), jnp.int32) for _ in range(3)]
    states.append(jnp.zeros((D,), jnp.int32))  # START lives in the skip slot

    for t in range(T):
        exact_add = jnp.where(exact_mask[t], 0, 1).astype(jnp.int32)
        new_states = []
        visit_prevs = [3] if t == 0 else [0, 1, 2]
        for cls in range(3):
            base = (
                (cls << sh_ty)
                + (jnp.clip(fid_cost[t, cls], 0, 7).astype(jnp.int32) << sh_fd)
                + (jnp.clip(pos_cost[t, cls], 0, 10).astype(jnp.int32) << sh_ps)
                + exact_add
            )
            best = None
            for prev in visit_prevs:
                add = base
                if t > 0:
                    add = base + (
                        pair_cost[t - 1, prev, cls].astype(jnp.int32) << sh_px
                    )
                cand = states[prev] + add
                best = cand if best is None else jnp.minimum(best, cand)
            best = jnp.where(class_mask[t, cls], best, BIG)
            new_states.append(jnp.minimum(best, BIG))
        skip_add = jnp.int32(1 << sh_w)
        if t == 0:
            best_skip = BIG * jnp.ones((D,), jnp.int32)
        else:
            best_skip = states[0]
            for prev in range(1, 4):
                best_skip = jnp.minimum(best_skip, states[prev])
            best_skip = jnp.minimum(best_skip + skip_add, BIG)
        new_states.append(best_skip)
        states = new_states

    key = jnp.minimum(
        jnp.minimum(states[0], states[1]), jnp.minimum(states[2], states[3])
    )
    return key, BIG, sh_ea, sh_w


@functools.partial(jax.jit, donate_argnums=(0,))
def append_rows(pool, fresh, used):
    """Scatter a fixed-size chunk of fresh rows at the watermark. Donated:
    the pool updates in place; one compiled variant per pool shape."""
    zero = jnp.zeros((), dtype=jnp.asarray(used).dtype)
    return jax.lax.dynamic_update_slice(pool, fresh, (used, zero))


@functools.partial(jax.jit, static_argnames=("T", "D", "k"))
def planes_chain_topk(
    bit_pool,  # (NB, D/32) int32 — resident, NOT donated
    byte_pool,  # (NC, D) int8 — resident, NOT donated
    class_rows,  # (B, T, 3) int32 bit rows
    exact_rows,  # (B, T) int32 bit rows
    universe,  # (B, D/32) int32 packed filter universes
    use_valid,  # (B,) bool — True: intersect with `universe` row
    pair_rows,  # (B, tp, 3, 3) int32 byte rows
    fid_rows,  # (B, T, 3) int32 byte rows
    pos_rows,  # (B, T, 3) int32 byte rows
    ea_rows,  # (B, T+1) int32 byte rows
    adj,  # (B, tp) bool
    live,  # (D,) bool
    T: int,
    D: int,
    k: int,
):
    """Returns one (B, 4k+1) int32 tensor: [idx1 | key1 | idx2 | key2 | count]."""
    tp = max(T - 1, 1)

    def unpack(rows):
        words = bit_pool[rows]  # (..., D/32)
        bits = (words[..., None] >> jnp.arange(32, dtype=jnp.int32)) & 1
        return bits.reshape(rows.shape + (D,)).astype(bool)

    def unpack_words(words):  # (D/32,) int32 -> (D,) bool
        bits = (words[:, None] >> jnp.arange(32, dtype=jnp.int32)) & 1
        return bits.reshape(D).astype(bool)

    def one(args):
        crows, erows, urow, uv, prows, frows, orows, earows, aj = args
        class_mask = unpack(crows)  # (T, 3, D)
        exact_mask = unpack(erows)  # (T, D)

        pair_b = byte_pool[prows]  # (tp, 3, 3, D) int8
        pair_cost = jnp.where(pair_b < 0, jnp.int8(3), pair_b)
        # non-adjacent consecutive terms have the free term edge (cost 0)
        pair_cost = jnp.where(aj[:tp, None, None, None], pair_cost, 0)

        fid_cost = byte_pool[frows]  # (T, 3, D) int8 (-1 = absent)
        pos_cost = byte_pool[orows]

        key, BIG, sh_ea, sh_w = _packed_chain_dp(
            class_mask, pair_cost, fid_cost, pos_cost, exact_mask, T, D
        )
        dead = key >= BIG  # no valid interpretation

        # ExactAttribute rank selected by each doc's words level via a
        # select-sum over the small level axis (a per-doc gather would be a
        # 270 ns/element random access on this hardware). The 2-bit gap at
        # sh_ea was left zero by the DP.
        ea_b = byte_pool[earows]  # (T+1, D) int8
        ea_rank = jnp.where(ea_b < 0, jnp.int8(2), ea_b).astype(jnp.int32)
        level = jnp.clip(T - (key >> sh_w), 0, T)
        levels = jnp.arange(T + 1, dtype=jnp.int32)[:, None]
        ea = jnp.sum(jnp.where(level[None, :] == levels, ea_rank, 0), axis=0)
        key = key | (ea << sh_ea)

        valid = jnp.where(uv, unpack_words(urow) & live, live)
        invalid = (~valid) | dead
        key = jnp.where(invalid, jnp.int32(1) << 30, key)
        # TPU top_k does NOT break ties by lower index (measured: tie
        # members come back scrambled and the k-boundary picks arbitrary
        # tie-class members). Exact selection: top_k by key gives the kth
        # key threshold and every strictly-better doc; a second top_k over
        # the tie class picks its LOWEST docids; the host merges both 1k
        # lists and finishes with a stable (key, docid) sort of 2k rows.
        negv, idx1 = jax.lax.top_k(-key, k)
        key1 = -negv
        kth = key1[k - 1]
        tie_rank = jnp.where(
            key == kth, -jnp.arange(D, dtype=jnp.int32), jnp.int32(-(2**31) + 1)
        )
        tr2, idx2 = jax.lax.top_k(tie_rank, k)
        key2 = jnp.where(tr2 > jnp.int32(-(2**31) + 1), kth, jnp.int32(1) << 30)
        count = jnp.sum(~invalid).astype(jnp.int32)
        return idx1.astype(jnp.int32), key1, idx2.astype(jnp.int32), key2, count

    # chunked map bounds peak HBM: vmap over the full batch materializes
    # (B, T, 3, D) temporaries — 46 GB at D=2^20 (measured OOM with the
    # 6-row DP). Above the threshold, chunks run as an on-device loop
    # (no extra host dispatches).
    xs = (
        class_rows,
        exact_rows,
        universe,
        use_valid,
        pair_rows,
        fid_rows,
        pos_rows,
        ea_rows,
        adj,
    )
    # chunk=16 measured at D=2^20: compile 150 s, warm 0.47 s/32 queries,
    # peak fits HBM (full vmap needs 17.6 GB > 16 GB; chunk=8's scan took
    # pathologically long to compile)
    bs = int(os.environ.get("MEILI_TPU_BATCH_CHUNK", "16"))
    if D <= (1 << 18) or bs >= class_rows.shape[0]:
        idx1, key1, idx2, key2, counts = jax.vmap(lambda *a: one(a))(*xs)
    else:
        idx1, key1, idx2, key2, counts = jax.lax.map(one, xs, batch_size=bs)
    # ONE output tensor: each host readback over the tunnel is a round
    # trip, so the candidate lists and counts ride together
    out = jnp.concatenate(
        [idx1, key1, idx2, key2, counts[:, None]], axis=1
    )
    return out


def merge_topk_host(idx1, key1, idx2, key2, count, k):
    """Exact ordered top-k from the kernel's two candidate lists (numpy,
    2k rows). Returns docids ascending by (key, docid), -1 padded."""
    import numpy as np

    invalid_key = np.int32(1) << 30
    idx = np.concatenate([idx1, idx2])
    key = np.concatenate([key1, key2])
    keep = key < invalid_key
    idx, key = idx[keep], key[keep]
    idx, uniq = np.unique(idx, return_index=True)
    key = key[uniq]
    order = np.lexsort((idx, key))[: min(k, count)]
    out = np.full(k, -1, dtype=np.int32)
    out[: len(order)] = idx[order]
    return out
