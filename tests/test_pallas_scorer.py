"""Pallas fused scorer parity (interpret mode, CPU).

Pins key-for-key equality between ops/pallas_scorer.pallas_chain_keys and
the XLA reference path (_planes_chain_topk_xla) on randomized pools, and
full-output equality of the fused wrapper (top_k + tie pass included).
The kernel's layout contracts (lane-blocked planes, bit-blocked bitmaps,
lane-major keys) are exactly the ones the serving path relies on
(search/device_batch.py), so a failure here means wrong RANKINGS, not a
perf regression."""

import numpy as np
import pytest

from meilisearch_tpu.index.device_arena import pack_bitmap, pack_plane
from meilisearch_tpu.ops.arena_scorer import (
    INVALID_KEY,
    _planes_chain_topk_fused,
    _planes_chain_topk_xla,
)

D = 1 << 14  # smallest pallas-supported bucket; interpret mode is slow
B = 4
K = 64


def _random_inputs(T, seed):
    rng = np.random.default_rng(seed)
    tp = max(T - 1, 1)
    n_rows = 1 + T * 3 + tp * 3 + (T + 1) + 1  # identity + planes + sort
    pool_bytes = np.full((n_rows, D), -1, np.int8)
    for r in range(1, n_rows):
        # sparse presence with packed (exact|fid|pos) byte values
        mask = rng.random(D) < rng.uniform(0.05, 0.4)
        vals = rng.integers(0, 128, size=D).astype(np.int8)
        pool_bytes[r] = np.where(mask, vals, np.int8(-1))
    byte_pool = np.stack([pack_plane(row) for row in pool_bytes])

    ridx = 1
    term_rows = np.zeros((B, T, 3), np.int32)
    pair_rows = np.zeros((B, tp, 3), np.int32)
    ea_rows = np.zeros((B, T + 1), np.int32)
    for t in range(T):
        for c in range(3):
            term_rows[:, t, c] = ridx if rng.random() < 0.8 else 0
            ridx += 1
    for i in range(tp):
        for c in range(3):
            pair_rows[:, i, c] = ridx if rng.random() < 0.8 else 0
            ridx += 1
    for lvl in range(T + 1):
        ea_rows[:, lvl] = ridx
        ridx += 1
    sort_rows = np.full(B, ridx, np.int32)
    sort_rows[0] = 0  # one no-sort row

    use_sort = rng.random(B) < 0.5
    universe = np.stack(
        [
            pack_bitmap(
                np.flatnonzero(rng.random(D) < 0.7).astype(np.int64), D
            )
            for _ in range(B)
        ]
    )
    use_valid = rng.random(B) < 0.5
    adj = rng.random((B, tp)) < 0.7
    # random mandatory flags (phrase terms); real descriptors always have
    # at least one (term 0 when no phrase exists) — keep that invariant
    mand = rng.random((B, T)) < 0.3
    mand[:, 0] |= ~mand.any(axis=1)
    live = pack_bitmap(
        np.flatnonzero(rng.random(D) < 0.9).astype(np.int64), D
    )
    return (
        byte_pool, term_rows, pair_rows, ea_rows, sort_rows,
        use_sort, universe, use_valid, adj, mand, live,
    )


@pytest.mark.parametrize("T,seed", [(3, 7), (6, 11)])
def test_fused_matches_xla_reference(T, seed):
    args = _random_inputs(T, seed)
    mask_sel = np.array([1, 0, 2, 0], np.int32)
    out_ref, candw_ref, masks_ref = _planes_chain_topk_xla(
        *args, mask_sel, T=T, D=D, k=K
    )
    out_fused, candw_fused, masks_fused = _planes_chain_topk_fused(
        *args, mask_sel, T=T, D=D, k=K, interpret=True
    )
    out_ref = np.asarray(out_ref)
    out_fused = np.asarray(out_fused)
    np.testing.assert_array_equal(
        np.asarray(candw_fused), np.asarray(candw_ref)
    )
    np.testing.assert_array_equal(
        np.asarray(masks_fused), np.asarray(masks_ref)
    )
    np.testing.assert_array_equal(
        np.asarray(masks_ref), np.asarray(candw_ref)[mask_sel]
    )
    k = K
    # counts identical
    np.testing.assert_array_equal(out_fused[:, 4 * k], out_ref[:, 4 * k])
    # selection: same (key, idx) multisets and identical keys per rank
    # (top_k tie order within equal keys is backend-deterministic on the
    # same platform, but compare order-insensitively to stay robust)
    for b in range(B):
        for lo, hi in ((0, k), (2 * k, 3 * k)):
            ids_r = out_ref[b, lo : lo + k]
            keys_r = out_ref[b, lo + k : lo + 2 * k]
            ids_f = out_fused[b, lo : lo + k]
            keys_f = out_fused[b, lo + k : lo + 2 * k]
            ref_pairs = sorted(zip(keys_r.tolist(), ids_r.tolist()))
            fus_pairs = sorted(zip(keys_f.tolist(), ids_f.tolist()))
            assert ref_pairs == fus_pairs, (b, lo)


@pytest.mark.parametrize("T,seed", [(3, 7)])
def test_sort_selection_matches_xla_reference(T, seed):
    """The single-variadic-sort selection (MEILI_TPU_SELECT=sort) must
    produce the same exact top-k multiset and the same kth-tie class
    ordering as the two-top_k reference."""
    args = _random_inputs(T, seed)
    mask_sel = np.zeros(4, np.int32)
    out_ref, _, _ = _planes_chain_topk_xla(*args, mask_sel, T=T, D=D, k=K)
    out_s, _, _ = _planes_chain_topk_fused(
        *args, mask_sel, T=T, D=D, k=K, interpret=True, select="sort"
    )
    out_ref = np.asarray(out_ref)
    out_s = np.asarray(out_s)
    k = K
    np.testing.assert_array_equal(out_s[:, 4 * k], out_ref[:, 4 * k])
    for b in range(B):
        # selection: identical (key, idx) multisets
        ref_pairs = sorted(
            zip(out_ref[b, k : 2 * k].tolist(), out_ref[b, :k].tolist())
        )
        s_pairs = sorted(
            zip(out_s[b, k : 2 * k].tolist(), out_s[b, :k].tolist())
        )
        assert ref_pairs == s_pairs, b
        # kth-tie pass: same VALID members in the same (qsort, docid)
        # order (entries at INVALID_KEY are padding the merge discards)
        from meilisearch_tpu.ops.arena_scorer import INVALID_KEY

        ref2 = [
            (kk, ii)
            for kk, ii in zip(
                out_ref[b, 3 * k : 4 * k].tolist(),
                out_ref[b, 2 * k : 3 * k].tolist(),
            )
            if kk < INVALID_KEY
        ]
        s2 = [
            (kk, ii)
            for kk, ii in zip(
                out_s[b, 3 * k : 4 * k].tolist(),
                out_s[b, 2 * k : 3 * k].tolist(),
            )
            if kk < INVALID_KEY
        ]
        assert ref2 == s2, b


def test_fused_key_oracle():
    """Independent oracle: the numpy DP mirror (the delta-overlay scorer)
    recomputes every candidate's key from the raw planes; the fused
    kernel's selected (idx, key) pairs must agree with it."""
    from meilisearch_tpu.ops.arena_scorer import packed_chain_dp_np

    T, seed = 3, 23
    (
        byte_pool, term_rows, pair_rows, ea_rows, sort_rows,
        use_sort, universe, use_valid, adj, mand, live,
    ) = _random_inputs(T, seed)
    out_fused, _, _ = _planes_chain_topk_fused(
        byte_pool, term_rows, pair_rows, ea_rows, sort_rows,
        use_sort, universe, use_valid, adj, mand, live,
        np.zeros(4, np.int32),
        T=T, D=D, k=K, interpret=True,
    )
    out_fused = np.asarray(out_fused)

    # unpack planes back to bytes for the numpy mirror
    def unpack_row(r):
        w = np.asarray(byte_pool[r]).astype(np.int64) & 0xFFFFFFFF
        lanes = [((w >> (8 * j)) & 0xFF).astype(np.int64) for j in range(4)]
        b = np.concatenate(lanes)
        return ((b ^ 0x80) - 0x80).astype(np.int16)

    tp = max(T - 1, 1)
    n = D
    b = 0
    present = np.zeros((T, 3, n), bool)
    fid_c = np.zeros((T, 3, n), np.int16)
    pos_c = np.zeros((T, 3, n), np.int16)
    exact_m = np.zeros((T, n), bool)
    pair_c = np.zeros((tp, 3, 3, n), np.int16)
    for t in range(T):
        for c in range(3):
            p = unpack_row(term_rows[b, t, c])
            present[t, c] = p != -1
            fid_c[t, c] = (p >> 4) & 7
            pos_c[t, c] = p & 15
        p0 = unpack_row(term_rows[b, t, 0])
        exact_m[t] = (p0 < 0) & (p0 != -1)
    for i in range(tp):
        for pc in range(3):
            pr = unpack_row(pair_rows[b, i, pc])
            for c in range(3):
                cost = (pr >> (2 * c)) & 3
                pair_c[i, pc, c] = np.where(adj[b, i], cost, 0)
    key, BIG, sh_ea, sh_w = packed_chain_dp_np(
        present, fid_c, pos_c, pair_c, exact_m, T, mand=mand[b]
    )
    dead = key >= BIG
    level = np.clip(T - (key >> sh_w), 0, T)
    ea = np.zeros(n, np.int32)
    for lvl in range(T + 1):
        r = unpack_row(ea_rows[b, lvl]).astype(np.int32)
        r = np.where(r < 0, 2, r)
        ea = ea + np.where(level == lvl, r, 0)
    key = key | (ea << sh_ea)

    def unpack_bits(words):
        w = np.asarray(words).astype(np.int64) & 0xFFFFFFFF
        bits = (w[None, :] >> np.arange(32)[:, None]) & 1
        return bits.reshape(n).astype(bool)

    valid = unpack_bits(live)
    if use_valid[b]:
        valid &= unpack_bits(universe[b])
    key = np.where((~valid) | dead, np.int32(INVALID_KEY), key)

    k = K
    ids_f = out_fused[b, :k]
    keys_f = out_fused[b, k : 2 * k]
    sel = keys_f < INVALID_KEY
    np.testing.assert_array_equal(key[ids_f[sel]], keys_f[sel])
    # count matches the oracle's candidate count
    assert out_fused[b, 4 * k] == int(np.sum(key < INVALID_KEY))
