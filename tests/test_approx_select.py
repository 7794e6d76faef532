"""CPU unit tests for the PartialReduce exact-selection algorithm.

`ops/approx_select.py` shipped default-on in round 4 with zero CI
coverage (the gate excludes CPU backends) and regressed serving 11x.
These tests close that hole: `emulate_partial_reduce` reproduces the
probed TPU shard layout in pure JAX, so the peel / validation / decode
logic — everything except the hardware op itself — runs on CPU.

The contract under test is the `topk2` branch of
`arena_scorer._planes_chain_topk_fused` (reference semantics:
/root/reference/crates/milli/src/search/new/bucket_sort.rs:23):

  * pass 1 returns every doc whose sel_key is STRICTLY below the kth
    value (ties at the kth value may be arbitrary — pass 2 owns them);
  * pass 2 returns the kth tie class ordered by (qsort, docid) asc;
  * `exact` is tri-state: 2 only when validation PROVES both passes
    complete, 1 when only pass 1 is proven (the strictly-below-kth
    prefix is servable; the kth tie class is not), 0 when nothing is.
    A false 2 would serve a wrong page; a false 0 merely costs a host
    re-run. The critical property is: corrupted or overflowed results
    are NEVER reported more exact than they are.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from meilisearch_tpu.ops.approx_select import (
    INVALID,
    _f32_mono,
    _mono_inv,
    _peel_select,
    emulate_partial_reduce,
    select_approx,
)

# A layout shaped like the measured v5e one (G groups of D/G contiguous
# positions, strided mod l/G within a group) but small enough for CPU.
D, L, G = 4096, 256, 8
K = 64
ROUNDS = 4
RT = 0.9


def _emu(corrupt=None):
    fn = emulate_partial_reduce(G, L, D)
    if corrupt is None:
        return fn

    def wrapped(x, k, rt):
        v, i = fn(x, k, rt)
        return corrupt(v, i)

    return wrapped


def _naive_reference(sel_key, qsort, k):
    """The topk2 contract computed naively in numpy."""
    B, D_ = sel_key.shape
    out = []
    for b in range(B):
        order = np.argsort(sel_key[b], kind="stable")
        kth = sel_key[b][order[k - 1]]
        below = set(np.flatnonzero(sel_key[b] < kth).tolist())
        tie = np.flatnonzero(sel_key[b] == kth)
        tie = tie[np.argsort(qsort[b][tie] * (D_ + 1) + tie, kind="stable")]
        out.append((kth, below, tie[:k].tolist()))
    return out


def _run(sel_key, qsort, keys=None, reduce_fn=None, rounds=ROUNDS):
    if keys is None:
        keys = sel_key
    idx1, key1, idx2, key2, exact = select_approx(
        jnp.asarray(keys),
        jnp.asarray(sel_key),
        jnp.asarray(qsort),
        K,
        RT,
        rounds,
        G,
        L,
        reduce_fn=reduce_fn or _emu(),
    )
    return (
        np.asarray(idx1),
        np.asarray(key1),
        np.asarray(idx2),
        np.asarray(key2),
        np.asarray(exact),
    )


def _assert_matches_reference(sel_key, qsort, idx1, idx2, key2, exact):
    ref = _naive_reference(sel_key, qsort, K)
    for b in range(sel_key.shape[0]):
        assert exact[b] == 2, f"query {b} flagged inexact on clean data"
        kth, below, tie_prefix = ref[b]
        got_below = {
            int(i) for i in idx1[b] if sel_key[b][int(i)] < kth
        }
        assert got_below == below, f"query {b}: pass-1 strict-below set"
        n_tie = min(K, len(tie_prefix))
        got_tie = [int(i) for i in idx2[b][:n_tie] if key2[b][0] < INVALID]
        if kth < INVALID:
            assert got_tie == tie_prefix, f"query {b}: kth tie-class order"


def test_mono_bitcast_order_exact():
    rng = np.random.default_rng(1)
    v = rng.integers(0, 1 << 30, size=20000, dtype=np.int32)
    f = np.asarray(_f32_mono(jnp.asarray(v)))
    assert np.array_equal(
        np.argsort(f, kind="stable"), np.argsort(v, kind="stable")
    )
    assert np.array_equal(np.asarray(_mono_inv(jnp.asarray(f))), v)


def test_emulated_layout_matches_probe_contract():
    # slot j of the emulated op must hold the min of shard j, where
    # shard(p) = (p % C) + C * (p // (D // G)) — the identity the
    # hardware probe asserts (approx_select.probe_layout).
    rng = np.random.default_rng(2)
    x = rng.permutation(D).astype(np.float32)[None, :]
    v, i = _emu()(jnp.asarray(x), K, RT)
    v, i = np.asarray(v), np.asarray(i)
    C = L // G
    for j in range(L):
        g, c = j // C, j % C
        members = [
            p
            for p in range(g * (D // G), (g + 1) * (D // G))
            if p % C == c
        ]
        assert v[0, j] == min(x[0, p] for p in members)
        assert i[0, j] in members and x[0, i[0, j]] == v[0, j]


def test_exact_on_random_distinct():
    rng = np.random.default_rng(3)
    B = 4
    sel_key = np.stack(
        [rng.permutation(1 << 20)[:D].astype(np.int32) for _ in range(B)]
    )
    qsort = rng.integers(0, 256, size=(B, D), dtype=np.int32)
    idx1, key1, idx2, key2, exact = _run(sel_key, qsort)
    _assert_matches_reference(sel_key, qsort, idx1, idx2, key2, exact)


def test_exact_on_huge_tie_class():
    # The round-4 failure shape: one tie class covering ~the whole
    # plane (pass 2 selects among D equal sel_keys). The composite
    # (qsort << sh) | docid is distinct and the tiled transpose spreads
    # docid-adjacent winners across all L shards, so this MUST validate
    # exact and return the (qsort, docid)-ascending prefix.
    rng = np.random.default_rng(4)
    B = 3
    sel_key = np.full((B, D), 7, dtype=np.int32)
    sel_key[1, :K] = 3  # k docs strictly below a D-K tie class
    qsort = rng.integers(0, 256, size=(B, D), dtype=np.int32)
    idx1, key1, idx2, key2, exact = _run(sel_key, qsort)
    _assert_matches_reference(sel_key, qsort, idx1, idx2, key2, exact)


def test_exact_on_100k_tie_class_production_ratio():
    # Production-shaped: D=2^17 plane with l=2048 (same D/l=64 depth as
    # the measured v5e 2^20/16384 layout), k=256, and a tie class of
    # 100k docs — the 1M-doc shape class that round 4's bench hit.
    Dp, Lp, Gp, kp = 1 << 17, 2048, 8, 256
    rng = np.random.default_rng(6)
    sel_key = np.full((1, Dp), 9, dtype=np.int32)
    dead = rng.choice(Dp, size=Dp - 100_000, replace=False)
    sel_key[0, dead] = INVALID  # 100k-doc tie class, rest dead
    qsort = rng.integers(0, 8, size=(1, Dp), dtype=np.int32)
    idx1, key1, idx2, key2, exact = select_approx(
        jnp.asarray(sel_key),
        jnp.asarray(sel_key),
        jnp.asarray(qsort),
        kp,
        RT,
        ROUNDS,
        Gp,
        Lp,
        reduce_fn=emulate_partial_reduce(Gp, Lp, Dp),
    )
    exact = np.asarray(exact)
    assert exact[0] == 2, "100k tie class flagged inexact"
    # kth == 9 (the tie value); pass 2 must return the first kp members
    # in (qsort, docid) ascending order
    tie = np.flatnonzero(sel_key[0] == 9)
    order = tie[np.argsort(qsort[0][tie] * (Dp + 1) + tie, kind="stable")]
    assert [int(i) for i in np.asarray(idx2)[0]] == order[:kp].tolist()


def test_clustered_overflow_is_flagged_not_wrong():
    # More winners than the peel depth map to ONE shard even after the
    # tiled transpose (indices ≡ 0 mod L): an r-deep peel can only
    # surface r of them. Validation must flag the query — never exact=1.
    n_w = D // L  # every position of shard 0 (16 here), > ROUNDS
    assert n_w > ROUNDS
    sel_key = np.full((1, D), 1000, dtype=np.int32)
    winners = np.arange(n_w) * L  # all ≡ 0 (mod L) -> same shard
    sel_key[0, winners] = np.arange(n_w, dtype=np.int32)
    qsort = np.zeros((1, D), dtype=np.int32)
    idx1, key1, idx2, key2, exact = _run(sel_key, qsort, rounds=4)
    assert exact[0] == 0
    # strictly-below members that DID surface must still be genuine
    kth = np.sort(sel_key[0])[K - 1]
    for i in idx1[0]:
        assert sel_key[0, int(i)] <= 1000


@pytest.mark.parametrize("seed", [10, 11, 12, 13])
def test_validation_never_exact_on_corrupted_reduce(seed):
    # Property: if the reduce op silently drops true winners (wrong
    # layout guess on a future backend, miscompiled fusion, ...),
    # validation must not report exact=1.
    rng = np.random.default_rng(seed)
    B = 2
    sel_key = np.stack(
        [rng.permutation(1 << 20)[:D].astype(np.int32) for _ in range(B)]
    )
    qsort = rng.integers(0, 256, size=(B, D), dtype=np.int32)

    hide = jnp.asarray(
        np.sort(sel_key, axis=1)[:, : K // 2]
    )  # true winners' values

    def corrupt(v, i):
        # replace any slot that surfaced a hidden winner with a large
        # finite value (simulates the op never having seen it)
        bad = jnp.isin(_mono_inv(v), hide)
        big = _f32_mono(jnp.int32(INVALID - 1))
        return jnp.where(bad, big, v), i

    idx1, key1, idx2, key2, exact = _run(
        sel_key, qsort, reduce_fn=_emu(corrupt=lambda v, i: corrupt(v, i))
    )
    assert (exact == 0).all(), "validation blessed a corrupted selection"


def test_fewer_than_k_candidates():
    # < k live docs: kth == INVALID, pass-1 validation alone proves the
    # page; dead-doc shard collisions in pass 2 must not flag it.
    rng = np.random.default_rng(5)
    B = 2
    n_live = K // 2
    sel_key = np.full((B, D), INVALID, dtype=np.int32)
    for b in range(B):
        live = rng.choice(D, size=n_live, replace=False)
        sel_key[b, live] = rng.permutation(1000)[:n_live].astype(np.int32)
    qsort = rng.integers(0, 256, size=(B, D), dtype=np.int32)
    idx1, key1, idx2, key2, exact = _run(sel_key, qsort)
    for b in range(B):
        assert exact[b] == 2
        got = {int(i) for i in idx1[b] if sel_key[b][int(i)] < INVALID}
        assert got == set(np.flatnonzero(sel_key[b] < INVALID).tolist())


def test_pass2_corruption_gives_partial_exact():
    # Corrupt ONLY pass 2 (the tie-class selection): exact must drop to
    # 1 — the strictly-below-kth prefix stays proven and served, the
    # tie class does not.
    rng = np.random.default_rng(20)
    sel_key = np.full((1, D), 50, dtype=np.int32)
    sel_key[0, rng.choice(D, size=K // 2, replace=False)] = 10  # below kth
    qsort = rng.integers(0, 256, size=(1, D), dtype=np.int32)

    calls = {"n": 0}
    base = _emu()

    def reduce_fn(x, k, rt):
        v, i = base(x, k, rt)
        calls["n"] += 1
        if calls["n"] > ROUNDS:  # pass 2's rounds
            big = _f32_mono(jnp.int32(INVALID - 1))
            v = jnp.where(jnp.arange(v.shape[1]) % 2 == 0, big, v)
        return v, i

    idx1, key1, idx2, key2, exact = _run(sel_key, qsort, reduce_fn=reduce_fn)
    assert exact[0] == 1, "pass-2 corruption must yield partial exact"
    # pass 1's strict-below set is still complete
    below = set(np.flatnonzero(sel_key[0] < 50).tolist())
    got = {int(i) for i in idx1[0] if sel_key[0][int(i)] < 50}
    assert got == below


def test_merge_topk_host_tie_unproven_caps_prefix():
    # tie_proven=False caps n_exact at the strictly-below-kth run, so a
    # page inside that prefix serves and one touching the tie class
    # falls back (device_batch passes tie_proven=(exact==2)).
    from meilisearch_tpu.ops.arena_scorer import merge_topk_host

    k = 8
    # 3 docs strictly below the kth value (5), tie class fills the rest
    key1 = np.array([1, 2, 3, 5, 5, 5, 5, 5], dtype=np.int32)
    idx1 = np.array([30, 10, 20, 40, 41, 42, 43, 44], dtype=np.int32)
    key2 = np.full(k, 5, dtype=np.int32)
    idx2 = np.array([40, 41, 42, 43, 44, 45, 46, 47], dtype=np.int32)
    ranked, n_exact, total = merge_topk_host(
        idx1, key1, idx2, key2, count=100, k=k, tie_proven=False
    )
    assert n_exact == 3
    assert ranked[:3].tolist() == [30, 10, 20]
    ranked2, n_exact2, _ = merge_topk_host(
        idx1, key1, idx2, key2, count=100, k=k, tie_proven=True
    )
    assert n_exact2 >= n_exact


def test_peel_surfaces_shard_depth():
    # round j must return each shard's j-th best: with r rounds, any
    # winner set with ≤ r members per (post-transpose) shard is fully
    # surfaced. Place exactly `rounds` winners on each of 3 shards.
    sel_key = np.full((1, D), 500000, dtype=np.int32)
    w = 0
    for shard in (0, 5, 100):
        for depth in range(ROUNDS):
            sel_key[0, shard + depth * L] = w
            w += 1
    qsort = np.zeros((1, D), dtype=np.int32)
    f = _f32_mono(jnp.asarray(sel_key))
    idx, val, cv = _peel_select(
        f, K, RT, ROUNDS, D, G, L, reduce_fn=_emu()
    )
    got = {int(i) for i in np.asarray(idx)[0][:w]}
    want = {
        shard + depth * L
        for shard in (0, 5, 100)
        for depth in range(ROUNDS)
    }
    assert want <= got
