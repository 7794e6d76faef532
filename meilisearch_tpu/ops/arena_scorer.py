"""Plane-resident batched ranking: B chain queries, ONE execute, dense
row reads only.

Design forced by measurement on the tunneled v5e (see git history for the
raw numbers):

  * every execute costs a fixed ~27 ms round trip and readback streams at
    only ~25-70 MB/s -> batch queries AND keep outputs small;
  * random gather/scatter runs at ~270 ns/element while dense rows stream
    at HBM bandwidth -> posting structures live as dense per-document
    planes built once on host per (generation, structure) and resident
    thereafter (index/device_arena.py);
  * the kernel is HBM-bandwidth bound at 1M docs, so round 3 packs the
    per-(term, typo-class) structures into ONE byte plane each
    (bit 7 exact-word flag on the class-0 plane, bits 4-6 min field
    weight, bits 0-3 min position cost, -1 = class absent) and the pair
    proximities into ONE byte plane per (term-edge, left-class) (2-bit
    cost per right-class, fill 0b111111) — ~41 MB of row reads per query
    at D=2^20 versus ~90 MB for the round-2 separate-plane layout;
  * the pool is STORED as (NC, D/4) int32 with four doc-bytes per
    element (little order), because this backend's compile time explodes
    on int8 operands past ~2^28 elements (measured: a trivial gather
    over a 512 MB int8 operand compiles for >10 minutes, the same bytes
    as int32 compile in under a second); the kernel sign-extends the
    lanes after the row gather — same HBM traffic, 4x fewer elements;
  * a full-axis sort costs 0.1-10 s, lax.top_k rides under the dispatch
    floor -> the rank key packs into one int32 and top_k picks the page,
    a second top_k resolving the kth-key tie class exactly;
  * a cold XLA compile costs 30-290 s over the tunnel -> the NUMBER OF
    COMPILED VARIANTS is itself a first-order cost. This version compiles
    ONE scoring program per corpus-size bucket: B and T are fixed at
    their maxima, pool capacities are fixed per D, and row appends ride
    a separate trivial kernel so the scorer's shapes never change.

Round-3 additions (VERDICT r2 "widen the device-servable class"):

  * `sort_rows`/`use_sort`: a resident byte plane per (field, direction)
    holds the doc's quantized sort rank (value order quantized to 255
    buckets, stored as int8 rank-128). For sort queries the FIRST top_k
    selects on the key with the below-sort rule bits masked off (the
    reference's default criteria put `sort` between `attribute` and
    `exactness`, criterion.rs:28), and the kth-tie pass orders by
    (quantized rank, docid) so the host can reconstruct the exact
    (relevance, sort-value, exactness, docid) order — with an explicit
    ambiguity check that falls back to the host scorer when quantization
    cannot prove the page exact (search/device_batch.py).
  * `candwords`: the kernel also returns each query's FULL candidate set
    as a packed bitmap, left device-resident; the host fetches a 128 KB
    row only for queries that need full-candidate semantics (facet
    distribution, distinct totals) instead of paying a 4 MB readback on
    every batch over the ~25 MB/s tunnel.

The ranking semantics are the `last`-strategy suffix DP shared with
ops/batch_scorer (_chain_dp), pinned by tests/golden and the 3-way
ranking fuzz; parity target is search/new/bucket_sort.rs:23 ordering at
graph_based_ranking_rule.rs:220 fidelity.

Byte-plane value conventions (host side: index/device_arena.py):
  term rows: -1 absent; else bit7 exact (cls-0 plane only),
             bits 4-6 fid weight, bits 0-3 position cost
  pair rows: 2-bit min proximity cost per right-class at bits 0-1/2-3/4-5
  ea rows:   ExactAttribute rank 0/1 per words level, fill 2 (-1 -> 2)
  sort rows: quantized sort rank - 128 (row 0 = constant -> docid order)
Row 0 of the pool is all -1 (0xFFFFFFFF packed), so "structure absent"
is just row index 0.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .jax_setup import configure_jax

configure_jax()

INF32 = jnp.int32(1 << 24)
INVALID_KEY = 1 << 30
TOPK = 1024
# fixed candidate-bitmap output slots per batch (facet/distinct queries)
MASK_SLOTS = 4


def _key_layout(T: int):
    """Bit layout of the packed rank key for chain length T. The DP itself
    runs over this packed key (integer min == lexicographic min when every
    field is wide enough for its accumulated bound): words(T via skips),
    typo(2T), proximity(3(T-1)), fid(7T), position(10T), a 2-bit gap where
    the ExactAttribute rank lands AFTER the DP (it depends on the final
    words level), exactness(T). Total <= 29 bits for T <= 6.

    The `sort` ranking rule of the reference's default criteria sits
    between attributeRank (fid) and wordPosition (criterion.rs:121
    default_criteria), i.e. just below bit sh_fd: masking the low sh_fd
    bits (position + ea + exactness) yields the above-sort portion of
    the key."""
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


def _packed_chain_dp(
    present, fid_cost, pos_cost, pair_cost_fn, exact_mask, T, D, mand=None
):
    """`last`-strategy suffix DP over ONE packed int32 key per state —
    states [cls0, cls1, cls2, skip], a visit may only follow a visit (or
    START at t=0), the skip state absorbs all and never feeds back.

    `mand` ((T,) int32 0/1, optional) marks MANDATORY terms (reference
    query_graph.rs:379 removal_order...: phrase nodes get no removal
    group; when none exist the costliest group — the FIRST term — is
    popped instead). A mandatory term cannot be skipped and MAY be
    visited from the skip state (scorer.py suffix DP: "mandatory/phrase
    nodes always may"); entering from a skip carries no pair cost
    (_entry_cost: a skip src is never adjacent). Default None keeps the
    historical fixed shape: term 0 mandatory, the rest skippable.

    All per-(t, cls) inputs arrive as PYTHON lists of clean (D,) arrays
    and pair costs come from pair_cost_fn(t, prev, cls) -> (D,): static
    python indexing keeps every temp 1-D per example. (Indexing a
    (tp,3,3,D) tensor inside the loop left strided-slice temps shaped
    [chunk,1,1,1,D] whose TPU tile padding is 8x — measured 44 GB of HLO
    temps at D=2^20.)

    fid/pos values are clamped to their per-step bounds (7 / 10): the host
    builder guarantees a doc inside a present class always has fid and
    position postings for that (term, class)."""
    sh_ea, sh_ps, sh_fd, sh_px, sh_ty, sh_w, total = _key_layout(T)
    BIG = jnp.int32(1 << total)  # invalid-state sentinel (> any valid key)

    states = [BIG * jnp.ones((D,), jnp.int32) for _ in range(3)]
    states.append(jnp.zeros((D,), jnp.int32))  # START lives in the skip slot

    for t in range(T):
        exact_add = jnp.where(exact_mask[t], 0, 1).astype(jnp.int32)
        md = None if mand is None else mand[t]
        new_states = []
        visit_prevs = [3] if t == 0 else [0, 1, 2]
        for cls in range(3):
            base = (
                (cls << sh_ty)
                + (jnp.clip(fid_cost[t][cls], 0, 7).astype(jnp.int32) << sh_fd)
                + (jnp.clip(pos_cost[t][cls], 0, 10).astype(jnp.int32) << sh_ps)
                + exact_add
            )
            best = None
            for prev in visit_prevs:
                add = base
                if t > 0:
                    add = base + (
                        pair_cost_fn(t, prev, cls).astype(jnp.int32) << sh_px
                    )
                cand = states[prev] + add
                best = cand if best is None else jnp.minimum(best, cand)
            if md is not None and t > 0:
                # mandatory terms also visit from the skip state (no
                # pair cost: a skip src is never adjacent)
                cand = jnp.where(md != 0, states[3] + base, BIG)
                best = jnp.minimum(best, cand)
            best = jnp.where(present[t][cls], best, BIG)
            new_states.append(jnp.minimum(best, BIG))
        skip_add = jnp.int32(1 << sh_w)
        if mand is None and t == 0:
            best_skip = BIG * jnp.ones((D,), jnp.int32)
        else:
            best_skip = states[0]
            for prev in range(1, 4):
                best_skip = jnp.minimum(best_skip, states[prev])
            best_skip = jnp.minimum(best_skip + skip_add, BIG)
            if md is not None:
                best_skip = jnp.where(
                    md != 0, BIG * jnp.ones((D,), jnp.int32), best_skip
                )
        new_states.append(best_skip)
        states = new_states

    key = jnp.minimum(
        jnp.minimum(states[0], states[1]), jnp.minimum(states[2], states[3])
    )
    return key, BIG, sh_ea, sh_ps, sh_w


@functools.partial(jax.jit, donate_argnums=(0,))
def append_rows(pool, fresh, used):
    """Scatter a fixed-size chunk of fresh rows at the watermark. Donated:
    the pool updates in place; one compiled variant per pool shape."""
    zero = jnp.zeros((), dtype=jnp.asarray(used).dtype)
    return jax.lax.dynamic_update_slice(pool, fresh, (used, zero))


def _unpack_lanes(words, D: int):
    """(…, D/4) int32 -> (…, D) int32 of sign-extended bytes, lane-BLOCKED
    (index/device_arena.pack_plane): lane j covers docs [jD/4, (j+1)D/4).
    Four (…, D/4) lane arrays concatenate along the major axis — clean
    tile layouts; the interleaved form needed a (…, D/4, 4) temp whose
    trailing dim pads 32x (measured 727 GB/batch of traffic)."""
    lanes = [
        ((((words >> (8 * j)) & 0xFF) ^ 0x80) - 0x80) for j in range(4)
    ]
    return jnp.concatenate(lanes, axis=-1)


def planes_chain_topk(
    byte_pool,
    term_rows,
    pair_rows,
    ea_rows,
    sort_rows,
    use_sort,
    universe,
    use_valid,
    adj,
    mand,
    live_packed,
    T: int,
    D: int,
    k: int,
    mask_sel=None,
):
    """Routing wrapper: the fused Pallas scorer on real TPUs (VMEM-tiled
    DP, ~100x less HBM traffic than the XLA elementwise graph), the XLA
    reference path on CPU (pallas interpret mode is orders slower) and
    for sub-2^14 corpus buckets. Both produce identical outputs
    (tests/test_pallas_scorer.py pins key-for-key equality).

    Returns (out, candw, masks): `masks` is candw gathered at the
    MASK_SLOTS batch rows named by `mask_sel` — the facet/distinct
    queries' candidate bitmaps as one SMALL fixed-shape output (reading
    the whole (B, D/32) candw costs a ~4 MB tunnel transfer; reading rows
    one by one costs a ~27 ms round trip EACH, measured 1.7 s for a
    32-facet-query drain)."""
    from .pallas_scorer import pallas_supported

    if mask_sel is None:
        mask_sel = np.zeros(MASK_SLOTS, np.int32)
    from .backend_probe import backend_kind

    # by the time a device batch executes, routing has already resolved
    # the backend; a short wait covers direct callers (tests, dryrun)
    use_pallas = (
        os.environ.get("MEILI_TPU_PALLAS", "1") == "1"
        and pallas_supported(D)
        and backend_kind(wait_s=30.0) not in (None, "", "cpu")
    )
    if use_pallas:
        # topk2 is the production default: the approx (PartialReduce)
        # selection flagged ~all 1M-doc queries inexact in round 4
        # (BENCH_r04: 12.4 QPS vs 141.8 with topk2 — every flagged query
        # paid device + host). approx stays an opt-in experiment until it
        # beats topk2 END-TO-END on hardware (bench.py reports the
        # exact_flag_rate / host_fallbacks needed to prove it).
        select = os.environ.get("MEILI_TPU_SELECT", "topk2")
        G = L = 0
        if select == "approx":
            from .approx_select import approx_rt, probe_layout

            B = term_rows.shape[0]
            layout = probe_layout(B, D, k, approx_rt())
            if layout is None:
                # no consistent PartialReduce layout on this backend
                # (e.g. CPU decomposition) -> exact top_k selection
                select = "topk2"
            else:
                G, L = layout
        return _planes_chain_topk_fused(
            byte_pool, term_rows, pair_rows, ea_rows, sort_rows, use_sort,
            universe, use_valid, adj, mand, live_packed, mask_sel,
            T=T, D=D, k=k, select=select, approx_g=G, approx_l=L,
        )
    return _planes_chain_topk_xla(
        byte_pool, term_rows, pair_rows, ea_rows, sort_rows, use_sort,
        universe, use_valid, adj, mand, live_packed, mask_sel, T=T, D=D, k=k,
    )


@functools.partial(
    jax.jit,
    static_argnames=("T", "D", "k", "interpret", "select", "approx_g", "approx_l"),
)
def _planes_chain_topk_fused(
    byte_pool,
    term_rows,
    pair_rows,
    ea_rows,
    sort_rows,
    use_sort,
    universe,
    use_valid,
    adj,
    mand,
    live_packed,
    mask_sel,
    T: int,
    D: int,
    k: int,
    interpret: bool = False,
    select: str = "topk2",
    approx_g: int = 0,
    approx_l: int = 0,
):
    """Pallas DP -> (B, D) keys -> selection (`select`: peeled PartialReduce
    passes with exactness validation [default on TPU], two top_k passes, or
    one variadic sort). Same output contract as the XLA path plus a final
    per-query `exact` column (0 => that query must re-run on the host)."""
    from .pallas_scorer import pallas_chain_keys

    B = term_rows.shape[0]
    tp = max(T - 1, 1)
    _, _, sh_fd, _, _, _, _ = _key_layout(T)
    low_mask = jnp.int32((1 << sh_fd) - 1)

    rows = jnp.concatenate(
        [
            term_rows.reshape(B, T * 3),
            pair_rows.reshape(B, tp * 3),
            ea_rows.reshape(B, T + 1),
        ],
        axis=1,
    )
    keys, candw = pallas_chain_keys(
        byte_pool,
        rows,
        adj.astype(jnp.int32),
        mand.astype(jnp.int32),
        use_valid.astype(jnp.int32),
        universe,
        live_packed,
        T=T,
        D=D,
        interpret=interpret,
    )

    sel_key = jnp.where(use_sort[:, None], keys & ~low_mask, keys)
    qsort = (_unpack_lanes(byte_pool[sort_rows], D) + 128) & 255  # (B, D)
    # exact is tri-state (approx_select.select_approx): 2 = both passes
    # proven, 1 = strictly-below-kth prefix proven only, 0 = host re-run.
    # The top_k / sort selections are exact by construction -> 2.
    exact = jnp.full((B,), 2, jnp.int32)
    if select == "approx":
        from .approx_select import approx_rounds, approx_rt, select_approx

        idx1, key1, idx2, key2, exact = select_approx(
            keys, sel_key, qsort, k, approx_rt(), approx_rounds(),
            approx_g, approx_l,
        )
    elif select == "sort":
        # ONE variadic sort replaces both top_k passes: the ascending
        # (sel_key, qsort, docid) order IS the exact selection plus the
        # kth-tie ordering — the tie class is a contiguous run whose
        # first k members slice out at searchsorted(kth)
        iota = jnp.broadcast_to(
            jnp.arange(D, dtype=jnp.int32)[None, :], sel_key.shape
        )
        tie = (qsort << 23) | iota
        sk, _st, sidx = jax.lax.sort(
            (sel_key, tie, iota), dimension=1, num_keys=2
        )
        idx1 = sidx[:, :k]
        key1 = jnp.take_along_axis(keys, idx1, axis=1)
        kth = sk[:, k - 1]

        def row_slice(sk_row, sidx_row, kth_row):
            s = jnp.minimum(
                jnp.searchsorted(sk_row, kth_row).astype(jnp.int32), D - k
            )
            return (
                jax.lax.dynamic_slice(sk_row, (s,), (k,)),
                jax.lax.dynamic_slice(sidx_row, (s,), (k,)),
            )

        vals2, idx2 = jax.vmap(row_slice)(sk, sidx, kth)
        key2 = jnp.where(
            vals2 == kth[:, None],
            jnp.take_along_axis(keys, idx2, axis=1),
            jnp.int32(INVALID_KEY),
        )
    else:
        negv, idx1 = jax.lax.top_k(-sel_key, k)
        key1 = jnp.take_along_axis(keys, idx1, axis=1)
        kth = -negv[:, k - 1]
        iota = jnp.arange(D, dtype=jnp.int32)[None, :]
        tie_rank = jnp.where(
            sel_key == kth[:, None],
            -((qsort << 23) | iota),
            jnp.int32(-(2**31) + 1),
        )
        tr2, idx2 = jax.lax.top_k(tie_rank, k)
        key2 = jnp.where(
            tr2 > jnp.int32(-(2**31) + 1),
            jnp.take_along_axis(keys, idx2, axis=1),
            jnp.int32(INVALID_KEY),
        )
    # count = candidate-bitmap popcount (the bitmap is exactly ~invalid)
    counts = jnp.sum(
        jax.lax.population_count(candw), axis=1, dtype=jnp.int32
    )
    out = jnp.concatenate(
        [idx1.astype(jnp.int32), key1, idx2.astype(jnp.int32), key2,
         counts[:, None], exact[:, None]],
        axis=1,
    )
    return out, candw, jnp.take(candw, mask_sel, axis=0)


@functools.partial(jax.jit, static_argnames=("T", "D", "k"))
def _planes_chain_topk_xla(
    byte_pool,  # (NC, D/4) int32 — packed byte planes, resident, NOT donated
    term_rows,  # (B, T, 3) int32 byte rows: packed (exact|fid|pos) per class
    pair_rows,  # (B, tp, 3) int32 byte rows: 2-bit cost per right-class
    ea_rows,  # (B, T+1) int32 byte rows
    sort_rows,  # (B,) int32 byte rows (quantized sort rank - 128)
    use_sort,  # (B,) bool — mask below-sort key bits in selection
    universe,  # (B, D/32) int32 packed filter universes
    use_valid,  # (B,) bool — True: intersect with `universe` row
    adj,  # (B, tp) bool
    mand,  # (B, T) bool — mandatory terms (unskippable, visit-after-skip)
    live_packed,  # (D/32,) int32 packed live bitmap (bit-blocked)
    mask_sel,  # (MASK_SLOTS,) int32 batch rows whose candw rides back small
    T: int,
    D: int,
    k: int,
):
    """Returns (out, candwords):
    out        (B, 4k+2) int32: [idx1 | key1 | idx2 | key2 | count | exact]
    candwords  (B, D/32) int32: packed full candidate bitmaps (device-kept)
    (`exact` is always 1 here: top_k selection is exact by construction.)
    """
    tp = max(T - 1, 1)
    _, _, sh_fd, _, _, _, _ = _key_layout(T)
    low_mask = jnp.int32((1 << sh_fd) - 1)

    def unpack_words(words):  # (D/32,) int32 -> (D,) bool, bit-blocked
        rows = [((words >> j) & 1).astype(bool) for j in range(32)]
        return jnp.concatenate(rows, axis=-1)

    live = unpack_words(live_packed)

    def one(args):
        trows, prows, earows, srow, us, urow, uv, aj, md = args
        # slice the PACKED words per (t, cls) FIRST, then unpack: every
        # plane is a clean 1-D (D,) value per example. Unpacking the whole
        # (T,3,D) block and slicing after left [chunk,1,1,D] strided temps
        # whose TPU tile padding is 16x (measured 45 GB of HLO temps).
        words_t = byte_pool[trows]  # (T, 3, D/4) int32

        def plane(t, c):
            return _unpack_lanes(words_t[t, c], D)

        planes = [[plane(t, c) for c in range(3)] for t in range(T)]
        present = [
            [planes[t][c] != -1 for c in range(3)] for t in range(T)
        ]
        fid_cost = [
            [(planes[t][c] >> 4) & 7 for c in range(3)] for t in range(T)
        ]
        pos_cost = [
            [planes[t][c] & 15 for c in range(3)] for t in range(T)
        ]
        # exact flag: sign bit set but not the -1 absence sentinel; it is
        # only encoded on the class-0 plane (an exact original word is by
        # definition a zero-typo match)
        exact_mask = [
            (planes[t][0] < 0) & present[t][0] for t in range(T)
        ]

        pair_w = byte_pool[prows]  # (tp, 3, D/4) int32
        pair_planes = [
            [_unpack_lanes(pair_w[i, p], D) for p in range(3)]
            for i in range(tp)
        ]

        def pair_cost_fn(t, prev, cls):
            # non-adjacent consecutive terms have the free term edge
            cost = (pair_planes[t - 1][prev] >> (2 * cls)) & 3
            return jnp.where(aj[t - 1], cost, 0)

        key, BIG, sh_ea, sh_ps_, sh_w = _packed_chain_dp(
            present, fid_cost, pos_cost, pair_cost_fn, exact_mask, T, D,
            mand=md.astype(jnp.int32),
        )
        dead = key >= BIG  # no valid interpretation

        # ExactAttribute rank selected by each doc's words level via a
        # select-sum over the small level axis (a per-doc gather would be a
        # 270 ns/element random access on this hardware). The 2-bit gap at
        # sh_ea was left zero by the DP.
        ea_w = byte_pool[earows]  # (T+1, D/4) int32
        level = jnp.clip(T - (key >> sh_w), 0, T)
        ea = jnp.zeros((D,), jnp.int32)
        for lvl in range(T + 1):
            rank_l = _unpack_lanes(ea_w[lvl], D)
            rank_l = jnp.where(rank_l < 0, 2, rank_l)
            ea = ea + jnp.where(level == lvl, rank_l, 0)
        key = key | (ea << sh_ea)

        valid = jnp.where(uv, unpack_words(urow) & live, live)
        invalid = (~valid) | dead
        key = jnp.where(invalid, jnp.int32(INVALID_KEY), key)

        # the full candidate set as a packed bitmap (device-resident
        # output; host fetches single rows only for facet/distinct needs).
        # Bit-BLOCKED like the universe rows: bit j of word w = doc
        # j*D/32 + w — 64 clean (D/32,) ops, no small-dim reshape
        cand = ~invalid
        cwords = jnp.zeros((D // 32,), jnp.int32)
        for j in range(32):
            blk = jax.lax.dynamic_slice_in_dim(
                cand, j * (D // 32), D // 32
            ).astype(jnp.int32)
            cwords = cwords | (blk << j)

        # sort queries select on the key with the below-sort rule bits
        # masked (exactness resolves AFTER the sort value, host-side);
        # the invalid sentinel has no low bits so it survives the mask
        sel_key = jnp.where(us, key & ~low_mask, key)

        # TPU top_k does NOT break ties by lower index (measured: tie
        # members come back scrambled and the k-boundary picks arbitrary
        # tie-class members). Exact selection: top_k by sel_key gives the
        # kth threshold and every strictly-better doc; a second top_k over
        # the kth tie class picks its best members by (quantized sort
        # rank, docid); the host merges both lists exactly.
        negv, idx1 = jax.lax.top_k(-sel_key, k)
        key1 = key[idx1]
        kth = -negv[k - 1]
        qsort = (_unpack_lanes(byte_pool[srow], D) + 128) & 255  # 0..255
        iota = jnp.arange(D, dtype=jnp.int32)
        tie_rank = jnp.where(
            sel_key == kth,
            -((qsort << 23) | iota),
            jnp.int32(-(2**31) + 1),
        )
        tr2, idx2 = jax.lax.top_k(tie_rank, k)
        key2 = jnp.where(
            tr2 > jnp.int32(-(2**31) + 1), key[idx2], jnp.int32(INVALID_KEY)
        )
        count = jnp.sum(~invalid).astype(jnp.int32)
        return (
            idx1.astype(jnp.int32),
            key1,
            idx2.astype(jnp.int32),
            key2,
            count,
            cwords,
        )

    xs = (term_rows, pair_rows, ea_rows, sort_rows, use_sort, universe,
          use_valid, adj, mand)
    # chunking bounds peak HBM: vmap over the full batch materializes
    # (B, T, 3, D) int32 temporaries (~7 GB at D=2^20 for B=32). The
    # chunks UNROLL as separate vmap segments inside the one program —
    # a lax.map while-loop carried 8x-padded remat copies of every
    # singleton-dim temp across iterations (measured OOM at D=2^20).
    bs = int(os.environ.get("MEILI_TPU_BATCH_CHUNK", "8"))
    B = term_rows.shape[0]
    if D <= (1 << 18) or bs >= B:
        idx1, key1, idx2, key2, counts, cwords = jax.vmap(lambda *a: one(a))(*xs)
    else:
        parts = []
        for s0 in range(0, B, bs):
            sl = tuple(x[s0 : s0 + bs] for x in xs)
            parts.append(jax.vmap(lambda *a: one(a))(*sl))
        idx1, key1, idx2, key2, counts, cwords = (
            jnp.concatenate(ps, axis=0) for ps in zip(*parts)
        )
    # ONE small output tensor: each host readback over the tunnel is a
    # ~27 ms round trip at ~25-70 MB/s, so the candidate lists and counts
    # ride together and the (B, D/32) bitmap stays on device
    exact = jnp.ones((counts.shape[0], 1), jnp.int32)
    out = jnp.concatenate([idx1, key1, idx2, key2, counts[:, None], exact],
                          axis=1)
    return out, cwords, jnp.take(cwords, mask_sel, axis=0)


def packed_chain_dp_np(
    present, fid_cost, pos_cost, pair_cost, exact_mask, T, mand=None
):
    """Numpy mirror of _packed_chain_dp over (..., n) arrays — scores the
    MINOR-write delta docids host-side with byte-identical keys to the
    device kernel (search/device_batch.py score_delta overlay). Returns
    (key (n,), BIG, sh_ea, sh_w). `mand` ((T,) 0/1 or None) follows the
    same mandatory-term semantics as _packed_chain_dp."""
    import numpy as np

    sh_ea, sh_ps, sh_fd, sh_px, sh_ty, sh_w, total = _key_layout(T)
    BIG = np.int32(1 << total)
    n = present.shape[-1]

    states = [np.full(n, BIG, np.int32) for _ in range(3)]
    states.append(np.zeros(n, np.int32))

    for t in range(T):
        exact_add = np.where(exact_mask[t], 0, 1).astype(np.int32)
        md = None if mand is None else int(mand[t])
        new_states = []
        visit_prevs = [3] if t == 0 else [0, 1, 2]
        for cls in range(3):
            base = (
                (cls << sh_ty)
                + (np.clip(fid_cost[t, cls], 0, 7).astype(np.int32) << sh_fd)
                + (np.clip(pos_cost[t, cls], 0, 10).astype(np.int32) << sh_ps)
                + exact_add
            )
            best = None
            for prev in visit_prevs:
                add = base
                if t > 0:
                    add = base + (
                        pair_cost[t - 1, prev, cls].astype(np.int32) << sh_px
                    )
                cand = states[prev] + add
                best = cand if best is None else np.minimum(best, cand)
            if md and t > 0:
                # mandatory: also visitable from the skip state (no pair)
                best = np.minimum(best, states[3] + base)
            best = np.where(present[t, cls], best, BIG)
            new_states.append(np.minimum(best, BIG))
        if mand is None and t == 0:
            best_skip = np.full(n, BIG, np.int32)
        elif md:
            best_skip = np.full(n, BIG, np.int32)
        else:
            best_skip = states[0]
            for prev in range(1, 4):
                best_skip = np.minimum(best_skip, states[prev])
            best_skip = np.minimum(best_skip + np.int32(1 << sh_w), BIG)
        new_states.append(best_skip)
        states = new_states

    key = np.minimum(
        np.minimum(states[0], states[1]), np.minimum(states[2], states[3])
    )
    return key, BIG, sh_ea, sh_w


def merge_topk_host(
    idx1, key1, idx2, key2, count, k, delta_ids=None, delta_keys=None,
    tie_proven=True, return_keys=False,
):
    """Exact ordered top-k from the kernel's two candidate lists plus the
    host-scored delta overlay (numpy). Returns (docids int32 padded with
    -1, n_exact, total): docids ascend by (key, docid); positions past
    n_exact are not proven (a truncated kth-tie class may be missing base
    members that precede them). tie_proven=False means the device could
    not validate the kth tie class at all (approx_select exact==1): the
    proven prefix caps at the strictly-below-kth run — every below-kth
    base doc is present and the delta overlay is always complete, so that
    prefix's order is exact; the first kth-valued position is not."""
    import numpy as np

    invalid_key = np.int32(INVALID_KEY)
    idx = np.concatenate([idx1, idx2])
    key = np.concatenate([key1, key2])
    keep = key < invalid_key
    idx, key = idx[keep], key[keep]
    idx, uniq = np.unique(idx, return_index=True)
    key = key[uniq]
    total = int(count)
    is_delta = np.zeros(len(idx), dtype=bool)
    if delta_ids is not None and len(delta_ids):
        idx = np.concatenate([idx, delta_ids.astype(np.int32)])
        key = np.concatenate([key, delta_keys])
        is_delta = np.concatenate(
            [is_delta, np.ones(len(delta_ids), dtype=bool)]
        )
        total += len(delta_ids)

    order = np.lexsort((idx, key))
    idx_o, key_o = idx[order], key[order]

    n_exact = k
    n_tie = int(np.count_nonzero(key2 < invalid_key))
    kth = int(key1[k - 1]) if len(key1) >= k else None
    if not tie_proven:
        if kth is not None and kth < invalid_key:
            n_exact = int(np.count_nonzero(key_o < kth))
    elif count > k and n_tie >= k:
        # the kth-tie class was truncated at its k lowest docids; entries
        # of that class past the included-docid frontier may be preceded
        # by missing base members
        if kth is not None and kth < invalid_key:
            tie_dev = idx2[key2 < invalid_key]
            frontier = int(tie_dev.max()) if len(tie_dev) else -1
            ambiguous = (key_o == kth) & (idx_o > frontier)
            if ambiguous.any():
                n_exact = int(np.argmax(ambiguous))

    out = np.full(k, -1, dtype=np.int32)
    n = min(len(idx_o), k, total)
    out[:n] = idx_o[:n]
    if return_keys:
        # the packed DP key per returned slot (INVALID_KEY pads) — the
        # caller decodes per-rule costs from the bit fields for
        # showRankingScore on the device path
        keys_out = np.full(k, INVALID_KEY, dtype=np.int32)
        keys_out[:n] = key_o[:n]
        return out, n_exact, total, keys_out
    return out, n_exact, total


def merge_topk_sort_host(
    idx1, key1, idx2, key2, count, k, T, sort_key_rows, qsort_of,
    delta_ids=None, delta_keys=None, tie_proven=True, return_keys=False,
):
    """Exact ordered top-k for a SORT query (numpy). The kernel selected on
    the above-sort key portion; the final order is (above-sort key bits,
    sort criteria values, below-sort key bits, docid). Host-scored delta
    docids merge in with true sort values (they are always complete; only
    a truncated device kth-tie class limits the proven prefix).

    sort_key_rows: callback(candidate docids) -> list of key rows for the
    sort criteria in rule order (executor._sort_field_rows semantics).
    qsort_of: callback(candidate docids) -> quantized rank used on device
    (for the truncation-ambiguity proof).

    Returns (docids int32 padded with -1, n_exact, total): positions past
    n_exact are not proven; a page extending there must fall back to the
    host scorer."""
    import numpy as np

    sh_fd = _key_layout(T)[2]
    low_mask = (1 << sh_fd) - 1
    invalid_key = np.int32(INVALID_KEY)

    idx = np.concatenate([idx1, idx2])
    key = np.concatenate([key1, key2])
    keep = key < invalid_key
    idx, key = idx[keep], key[keep]
    idx, uniq = np.unique(idx, return_index=True)
    key = key[uniq]
    total = int(count)
    if delta_ids is not None and len(delta_ids):
        idx = np.concatenate([idx, delta_ids.astype(np.int32)])
        key = np.concatenate([key, delta_keys])
        total += len(delta_ids)
    if not len(idx):
        empty = np.full(k, -1, dtype=np.int32)
        if return_keys:
            return empty, k, total, np.full(k, INVALID_KEY, dtype=np.int32)
        return empty, k, total

    hi = key & ~np.int32(low_mask)
    # the device selection threshold comes from the device lists alone
    dev_hi = key1[key1 < invalid_key] & ~np.int32(low_mask)
    kth = int(dev_hi.max()) if len(dev_hi) else None
    # every base doc with hi < kth is present (top_k guarantees); the kth
    # bucket's base membership comes from the second top_k, selected by
    # (quantized rank, docid); delta docs are always complete
    srows = sort_key_rows(idx)
    lo = key & np.int32(low_mask)
    order = np.lexsort([idx, lo] + list(reversed(srows)) + [hi])
    idx_o, hi_o = idx[order], hi[order]

    # valid idx2 entries all belong to the kth bucket; if fewer than k came
    # back the bucket is complete and everything is exact
    truncated = int(np.count_nonzero(key2 < invalid_key)) >= k
    if not tie_proven:
        # the device could not validate the kth bucket's membership at
        # all (approx_select exact==1): only the strictly-below-kth
        # prefix is proven (pass 1 complete + delta always complete)
        n_exact = (
            int(np.count_nonzero(hi_o < kth)) if kth is not None else k
        )
    elif not truncated or count <= k or kth is None:
        n_exact = k
    else:
        in_kth = hi_o == kth
        q = qsort_of(idx_o)
        # the truncation frontier is the max quantized rank the DEVICE
        # returned for the tie class (delta entries don't move it)
        tie_dev = idx2[key2 < invalid_key]
        qmax = int(qsort_of(tie_dev).max()) if len(tie_dev) else 0
        # kth-bucket members with quantized rank < qmax are ALL present
        # base-side (second top_k truncates at the (qmax, docid)
        # frontier), so the exact prefix ends at the first member —
        # device or delta — with rank >= qmax
        ambiguous = in_kth & (q >= qmax)
        n_exact = int(np.argmax(ambiguous)) if ambiguous.any() else k

    out = np.full(k, -1, dtype=np.int32)
    n = min(len(idx_o), k, total)
    out[:n] = idx_o[:n]
    if return_keys:
        keys_out = np.full(k, INVALID_KEY, dtype=np.int32)
        keys_out[:n] = key[order][:n]
        return out, n_exact, total, keys_out
    return out, n_exact, total
