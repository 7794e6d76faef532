"""Pallas fused chain-DP scorer — the VMEM-resident rewrite of the
arena scoring pass (ops/arena_scorer.planes_chain_topk's per-doc math).

Why a hand kernel: the XLA version of the DP materializes every
elementwise temp as a full (D,) HBM tensor — its cost analysis showed
~150 GB of memory traffic per 32-query batch at D=2^20 (~270 ms) for
what is arithmetically a ~1.3 GB streaming problem. This kernel tiles
documents into VMEM blocks and runs the ENTIRE per-doc pipeline (lane
unpack -> packed-key suffix DP -> ExactAttribute fold -> validity ->
candidate-bitmap pack) on-chip, touching HBM once per pool row block.

Layout contracts (must match index/device_arena.py):
  * byte pool rows are lane-BLOCKED packed bytes: word w lane j holds
    doc j*(D/4) + w (pack_plane);
  * universe / live bitmaps are bit-BLOCKED: word w bit j holds doc
    j*(D/32) + w (pack_bitmap);
  * keys come back LANE-MAJOR: keys.reshape(B, D)[b, l*(D/4) + w] is
    doc l*(D/4) + w — exactly the flat doc index, so downstream top_k
    indices ARE docids (same invariant as the XLA path).

The grid is (B, (D/4) // WBLK): for a fixed query the word-blocks run
consecutively, so the per-query candidate-bitmap output block stays
resident in VMEM across its steps (the supported revisit-accumulate
pattern) and the universe row loads once per query. Pool rows arrive
through scalar-prefetch-driven BlockSpecs — the pipeline DMAs exactly
the (row, word-block) slices each descriptor names, double-buffered,
with zero gather ops.

Semantics parity target: ops/arena_scorer._packed_chain_dp +
the `one()` body of planes_chain_topk (tests/test_pallas_scorer.py pins
key-for-key equality in interpret mode; the STRICT device suites pin
end-to-end ranking).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .arena_scorer import INVALID_KEY, _key_layout

LANE = 512  # minor tile dim (4 x 128 lanes)


def W32R_OF(D: int) -> int:
    return (D // 32) // LANE


def _wblk(D: int) -> int:
    """Words per grid step. Mosaic needs the block's sublane dim (WBLK/512)
    to be a multiple of 8 (or the full array dim), so WBLK >= 4096; capped
    at 16384 for VMEM (measured at D=2^20: 66 ms/batch vs 87 ms at 8192 —
    fewer grid steps amortize the ~42 per-step DMAs; 32768 exceeds the
    16 MB scoped-vmem limit by 2 MB). Either WBLK divides the bit plane
    (D/32) or the bit plane divides WBLK — both window layouts are
    handled in the kernel."""
    return max(4096, min(16384, D // 32))


def pallas_supported(D: int) -> bool:
    # the bit plane (D/32) must hold >= one 512-lane row, and the word
    # row (D/4) must hold >= one 4096-word block
    return D >= (1 << 14)


def _unpack4(words, j):
    """(R, 512) packed int32 words -> lane j RAW bytes (0..255).

    No sign extension: every field the DP extracts is raw-byte safe —
    (p>>4)&7 and p&15 are preserved mod 16 under b-256, the absence
    sentinel -1 is b==0xFF, and the exact-flag sign bit is b>=0x80.
    Dropping the ^0x80/-0x80 pair removes 2 of the 4 VPU ops of the
    hottest loop in the kernel (~40 plane unpacks per grid step)."""
    return (words >> (8 * j)) & 0xFF


def _kernel_body(T, D, WBLK, refs):
    (
        rows_ref,  # scalar prefetch: (B, NR) int32 row ids
        adj_ref,  # scalar prefetch: (B, tp + T) int32 (0/1):
        #           [0, tp) adjacency flags, [tp, tp + T) mandatory flags
        uv_ref,  # scalar prefetch: (B,) int32 (0/1)
        plane_refs,  # NR refs, each (1, WR, LANE) packed words
        uni_ref,  # (1, W32R, LANE) packed universe row (per query)
        live_ref,  # (W32R, LANE) packed live bitmap (shared)
        keys_ref,  # out (1, 4, WR, LANE) int32
        candw_ref,  # out (1, W32R, LANE) int32 (revisit-accumulated)
    ) = refs
    b = pl.program_id(0)
    d = pl.program_id(1)
    tp = max(T - 1, 1)
    WR = WBLK // LANE
    w32 = D // 32
    wins_per_plane = w32 // WBLK

    sh_ea, sh_ps, sh_fd, sh_px, sh_ty, sh_w, total = _key_layout(T)
    BIG = jnp.int32(1 << total)

    def unpack_plane(ref):
        # (1, WR, LANE) packed words -> (4*WR, LANE) bytes, lanes stacked
        # along the sublane axis (lane-major doc order)
        w = ref[0]
        return jnp.concatenate([_unpack4(w, j) for j in range(4)], axis=0)

    n_term = T * 3
    n_pair = tp * 3

    def term_plane(t, c):
        return unpack_plane(plane_refs[t * 3 + c])

    def pair_plane(i, p):
        return unpack_plane(plane_refs[n_term + i * 3 + p])

    def ea_plane(lvl):
        return unpack_plane(plane_refs[n_term + n_pair + lvl])

    # -- packed-key suffix DP (mirror of _packed_chain_dp) ------------------
    shape = (4 * WR, LANE)
    states = [jnp.full(shape, BIG, jnp.int32) for _ in range(3)]
    states.append(jnp.zeros(shape, jnp.int32))

    for t in range(T):
        planes_t = [term_plane(t, c) for c in range(3)]
        # raw bytes: 0xFF = the -1 absence sentinel; >= 0x80 = sign bit
        present_t = [p != 0xFF for p in planes_t]
        exact_t = (planes_t[0] >= 0x80) & present_t[0]
        exact_add = jnp.where(exact_t, 0, 1).astype(jnp.int32)
        md = adj_ref[b, tp + t]  # mandatory flag (phrase terms / term 0)
        if t > 0:
            pair_t = [pair_plane(t - 1, p) for p in range(3)]
            aj = adj_ref[b, t - 1]
        new_states = []
        visit_prevs = [3] if t == 0 else [0, 1, 2]
        for cls in range(3):
            p = planes_t[cls]
            base = (
                (jnp.int32(cls) << sh_ty)
                + (((p >> 4) & 7) << sh_fd)
                + (jnp.minimum(p & 15, 10) << sh_ps)  # DP pos bound is 10
                + exact_add
            )
            best = None
            for prev in visit_prevs:
                add = base
                if t > 0:
                    cost = (pair_t[prev] >> (2 * cls)) & 3
                    cost = jnp.where(aj != 0, cost, 0)
                    add = base + (cost << sh_px)
                cand = states[prev] + add
                best = cand if best is None else jnp.minimum(best, cand)
            if t > 0:
                # mandatory terms also visit from the skip state (no
                # pair cost: a skip src is never adjacent)
                cand = jnp.where(md != 0, states[3] + base, BIG)
                best = jnp.minimum(best, cand)
            best = jnp.where(present_t[cls], best, BIG)
            new_states.append(jnp.minimum(best, BIG))
        best_skip = states[0]
        for prev in range(1, 4):
            best_skip = jnp.minimum(best_skip, states[prev])
        best_skip = jnp.minimum(best_skip + jnp.int32(1 << sh_w), BIG)
        best_skip = jnp.where(md != 0, BIG, best_skip)
        new_states.append(best_skip)
        states = new_states

    key = jnp.minimum(
        jnp.minimum(states[0], states[1]), jnp.minimum(states[2], states[3])
    )
    dead = key >= BIG

    # -- ExactAttribute rank by final words level --------------------------
    level = jnp.clip(T - (key >> sh_w), 0, T)
    ea = jnp.zeros(shape, jnp.int32)
    for lvl in range(T + 1):
        r = ea_plane(lvl)
        r = jnp.where(r >= 0x80, 2, r)  # raw bytes: negative ranks -> 2
        ea = ea + jnp.where(level == lvl, r, 0)
    key = key | (ea << sh_ea)

    # -- validity (universe & live, bit-blocked unpack) --------------------
    # bit-blocked bitmaps: bit j of word w = doc j*(D/32) + w. The tile's
    # sublane row r (lane l = r // WR, word row rr = r % WR) covers docs
    # [l*(D/4) + d*WBLK + rr*LANE, +LANE):
    #   bit plane  jb(r) = 8l + d*(WBLK//W32) + (rr*LANE)//W32   [slab:
    #              d//wins_per_plane when WBLK <= W32]
    #   word row   wrow(r) = ((rr*LANE) % W32) // LANE           [slab:
    #              (d % wins_per_plane)*WR + rr]
    use_u = uv_ref[b]
    if WBLK <= w32:
        # slab layout: the whole word-block sits inside ONE bit plane
        jb = d // wins_per_plane
        win = (d % wins_per_plane) * WR
        uni_w = uni_ref[0, pl.ds(win, WR), :]
        live_w = live_ref[pl.ds(win, WR), :]
        lanes_valid = []
        for l in range(4):
            shift = jb + 8 * l
            u = (uni_w >> shift) & 1
            lv = (live_w >> shift) & 1
            lanes_valid.append(jnp.where(use_u != 0, u & lv, lv))
        valid = jnp.concatenate(lanes_valid, axis=0) != 0
    else:
        # small-D layout: each 512-doc sublane row is its own bit window
        planes_per_blk = WBLK // w32
        rows_valid = []
        for r in range(4 * WR):
            l, rr = r // WR, r % WR
            jb_r = 8 * l + d * planes_per_blk + (rr * LANE) // w32
            wrow = ((rr * LANE) % w32) // LANE
            u = (uni_ref[0, pl.ds(wrow, 1), :] >> jb_r) & 1
            lv = (live_ref[pl.ds(wrow, 1), :] >> jb_r) & 1
            rows_valid.append(jnp.where(use_u != 0, u & lv, lv))
        valid = jnp.concatenate(rows_valid, axis=0) != 0

    invalid = (~valid) | dead
    key = jnp.where(invalid, jnp.int32(INVALID_KEY), key)
    for l in range(4):
        # per-lane writes avoid a sublane-splitting reshape; static
        # slices only (Mosaic has no dynamic_slice on values)
        keys_ref[0, l] = key[l * WR : (l + 1) * WR]

    # -- candidate bitmap (bit-blocked, accumulated per query) -------------
    @pl.when(d == 0)
    def _():
        candw_ref[0] = jnp.zeros_like(candw_ref[0])

    cand = (~invalid).astype(jnp.int32)
    if WBLK <= w32:
        bits = jnp.zeros((WR, LANE), jnp.int32)
        for l in range(4):
            blk = cand[l * WR : (l + 1) * WR]
            bits = bits | (blk << (jb + 8 * l))
        cur = candw_ref[0, pl.ds(win, WR), :]
        candw_ref[0, pl.ds(win, WR), :] = cur | bits
    else:
        planes_per_blk = WBLK // w32
        acc = [jnp.zeros((1, LANE), jnp.int32) for _ in range(W32R_OF(D))]
        for r in range(4 * WR):
            l, rr = r // WR, r % WR
            jb_r = 8 * l + d * planes_per_blk + (rr * LANE) // w32
            wrow = ((rr * LANE) % w32) // LANE
            row = cand[r : r + 1]
            acc[wrow] = acc[wrow] | (row << jb_r)
        for wrow in range(W32R_OF(D)):
            cur = candw_ref[0, pl.ds(wrow, 1), :]
            candw_ref[0, pl.ds(wrow, 1), :] = cur | acc[wrow]


@functools.partial(
    jax.jit, static_argnames=("T", "D", "interpret")
)
def pallas_chain_keys(
    byte_pool,  # (NC, D/4) int32 packed byte planes
    rows,  # (B, NR) int32: term rows (T*3) | pair rows (tp*3) | ea (T+1)
    adj,  # (B, tp) int32 0/1
    mand,  # (B, T) int32 0/1 — mandatory terms (unskippable,
    #        visit-after-skip; phrase terms, else term 0)
    use_valid,  # (B,) int32 0/1
    universe,  # (B, D/32) int32 packed filter universes
    live_packed,  # (D/32,) int32 packed live bitmap
    T: int,
    D: int,
    interpret: bool = False,
):
    """Returns (keys (B, D) int32 lane-major == doc order,
    candw (B, D/32) int32 bit-blocked candidate bitmaps)."""
    B = rows.shape[0]
    tp = max(T - 1, 1)
    # adjacency and mandatory flags ride ONE scalar-prefetch operand
    adj = jnp.concatenate(
        [adj.astype(jnp.int32), mand.astype(jnp.int32)], axis=1
    )
    NR = T * 3 + tp * 3 + (T + 1)
    assert rows.shape[1] == NR, (rows.shape, NR)
    WBLK = _wblk(D)
    WR = WBLK // LANE
    w32 = D // 32
    W32R = w32 // LANE
    nw = (D // 4) // WBLK

    pool3 = byte_pool.reshape(byte_pool.shape[0], (D // 4) // LANE, LANE)
    uni3 = universe.reshape(B, W32R, LANE)
    live2 = live_packed.reshape(W32R, LANE)

    def row_spec(i):
        return pl.BlockSpec(
            (1, WR, LANE),
            lambda b, d, rows_ref, adj_ref, uv_ref, i=i: (
                rows_ref[b, i],
                d,
                0,
            ),
        )

    in_specs = [row_spec(i) for i in range(NR)]
    in_specs.append(
        pl.BlockSpec(
            (1, W32R, LANE),
            lambda b, d, rows_ref, adj_ref, uv_ref: (b, 0, 0),
        )
    )
    in_specs.append(
        pl.BlockSpec(
            (W32R, LANE),
            lambda b, d, rows_ref, adj_ref, uv_ref: (0, 0),
        )
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nw),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 4, WR, LANE),
                lambda b, d, rows_ref, adj_ref, uv_ref: (b, 0, d, 0),
            ),
            pl.BlockSpec(
                (1, W32R, LANE),
                lambda b, d, rows_ref, adj_ref, uv_ref: (b, 0, 0),
            ),
        ],
    )

    def kernel(*refs):
        rows_ref, adj_ref, uv_ref = refs[:3]
        plane_refs = refs[3 : 3 + NR]
        uni_ref, live_ref = refs[3 + NR], refs[4 + NR]
        keys_ref, candw_ref = refs[5 + NR], refs[6 + NR]
        _kernel_body(
            T,
            D,
            WBLK,
            (
                rows_ref,
                adj_ref,
                uv_ref,
                plane_refs,
                uni_ref,
                live_ref,
                keys_ref,
                candw_ref,
            ),
        )

    keys4, candw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 4, (D // 4) // LANE, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, W32R, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(
        rows,
        adj,
        use_valid,
        *([pool3] * NR),
        uni3,
        live2,
    )
    return keys4.reshape(B, D), candw.reshape(B, w32)
