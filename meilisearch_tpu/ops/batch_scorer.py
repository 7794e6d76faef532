"""Batched device ranking: B chain queries in ONE XLA execute.

Why batching is the unit of work: on the TPU-serving path every execute
pays a fixed dispatch round trip (~28 ms over the axon tunnel, ~0.1 ms on a
co-located host), so per-query offload can never win. This kernel amortizes
that cost across a batch — the host ships compact posting-ID descriptors
(int32 indices, not dense masks), the device scatters them into per-term
cost planes, runs the fused lexicographic DP, and returns each query's
top-k. This is the "host shim batches N queries into one device program"
row of SURVEY §2.6, replacing the reference's one-core-per-search serving
model (meilisearch search_queue.rs:31).

Descriptor encoding (per query, padded to shared buckets; the pad index
points one past the plane so scatters drop it):
  class_idx : (Lc,) flat (t*3+c)*D + docid        -> class_mask  (T,3,D)
  pair_idx/val : (Lp,) flat ((t-1)*9+pc*3+c)*D+id -> pair_cost   (T-1,3,3,D)
                 scatter-min rel 0..2 onto default 3; `adj` zeroes
                 non-adjacent edges (the free term edge)
  fid_idx/val  : (Lf,) scatter-min weight onto INF -> fid_cost   (T,3,D)
  pos_idx/val  : (Lo,) scatter-min cost onto INF   -> pos_cost   (T,3,D)
  exact_idx    : (Le,) flat t*D + id               -> exact_mask (T,D)
  ea_idx/val   : (La,) flat level*D + id, val 0/1  -> ea_rank    (T+1,D) def 2
  valid_idx    : (Lv,) docid                       -> filter universe when
                 use_valid, else the live mask
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from .jax_setup import configure_jax

configure_jax()

INF32 = jnp.int32(1 << 24)
INF16 = jnp.int32(20000)  # fid/pos plane sentinel (int16-safe)
N_DIMS = 6


def _lexmin(a, b):
    lt = jnp.zeros(a.shape[1:], dtype=bool)
    eq = jnp.ones(a.shape[1:], dtype=bool)
    for d in range(a.shape[0]):
        lt = lt | (eq & (a[d] < b[d]))
        eq = eq & (a[d] == b[d])
    return jnp.where(lt[None], a, b)


def _chain_dp(class_mask, pair_cost, fid_cost, pos_cost, exact_mask, T, D):
    """`last`-strategy suffix DP (states [cls0, cls1, cls2, skip]); mirrors
    scorer._run_packed semantics for 1-gram chains."""

    def state_costs(t, prev_states):
        exact_pen = jnp.where(exact_mask[t], 0, 1).astype(jnp.int32)
        new_states = []
        visit_prevs = [3] if t == 0 else [0, 1, 2]
        for cls in range(3):
            best = None
            for prev in visit_prevs:
                entry = jnp.zeros((N_DIMS, D), dtype=jnp.int32)
                entry = entry.at[1].add(cls)
                if t > 0:
                    entry = entry.at[2].add(
                        pair_cost[t - 1, prev, cls].astype(jnp.int32)
                    )
                entry = entry.at[3].add(
                    jnp.where(
                        fid_cost[t, cls] >= INF16, INF32, fid_cost[t, cls]
                    ).astype(jnp.int32)
                )
                entry = entry.at[4].add(
                    jnp.where(
                        pos_cost[t, cls] >= INF16, INF32, pos_cost[t, cls]
                    ).astype(jnp.int32)
                )
                entry = entry.at[5].add(exact_pen)
                entry = entry.at[0].add(
                    jnp.where(class_mask[t, cls], 0, INF32)
                )
                cand = prev_states[prev] + entry
                best = cand if best is None else _lexmin(best, cand)
            new_states.append(best)
        skip_entry = jnp.zeros((N_DIMS, D), jnp.int32).at[0].add(1)
        if t == 0:
            best_skip = jnp.full((N_DIMS, D), INF32, jnp.int32)
        else:
            best_skip = None
            for prev in range(4):
                cand = prev_states[prev] + skip_entry
                best_skip = (
                    cand if best_skip is None else _lexmin(best_skip, cand)
                )
        new_states.append(best_skip)
        return jnp.stack(new_states)

    zero = jnp.zeros((N_DIMS, D), jnp.int32)
    inf_state = jnp.full((N_DIMS, D), INF32, jnp.int32)
    states = jnp.stack([inf_state, inf_state, inf_state, zero])
    for t in range(T):
        states = state_costs(t, states)
    final = _lexmin(
        _lexmin(states[0], states[1]), _lexmin(states[2], states[3])
    )
    return jnp.minimum(final, INF32)


@functools.partial(jax.jit, static_argnames=("T", "D", "k"))
def batched_chain_topk(
    class_idx,
    pair_idx,
    pair_val,
    adj,
    fid_idx,
    fid_val,
    pos_idx,
    pos_val,
    exact_idx,
    ea_idx,
    ea_val,
    valid_idx,
    use_valid,
    live,
    T: int,
    D: int,
    k: int,
):
    """Returns (top_docids (B,k) int32 [-1 padded], counts (B,) int32)."""

    def one(ci, pi, pv, aj, fi, fv, oi, ov, ei, ai, av, vi, uv):
        # each scatter target gets a dump REGION as large as its index
        # vector: pads are consecutive unique indices there, so padded
        # scatters stay collision-free (a single shared dump slot serializes
        # on TPU and costs seconds)
        class_mask = (
            jnp.zeros(T * 3 * D + ci.shape[0], bool)
            .at[ci]
            .set(True)[: T * 3 * D]
        ).reshape(T, 3, D)
        tp = max(T - 1, 1)
        pair_cost = (
            jnp.full(tp * 9 * D + pi.shape[0], 3, jnp.int8)
            .at[pi]
            .min(pv)[: tp * 9 * D]
        ).reshape(tp, 3, 3, D)
        # non-adjacent consecutive terms have the free term edge (cost 0)
        pair_cost = jnp.where(aj[: tp, None, None, None], pair_cost, 0)
        fid_cost = (
            jnp.full(T * 3 * D + fi.shape[0], INF16, jnp.int16)
            .at[fi]
            .min(fv)[: T * 3 * D]
        ).reshape(T, 3, D)
        pos_cost = (
            jnp.full(T * 3 * D + oi.shape[0], INF16, jnp.int16)
            .at[oi]
            .min(ov)[: T * 3 * D]
        ).reshape(T, 3, D)
        exact_mask = (
            jnp.zeros(T * D + ei.shape[0], bool).at[ei].set(True)[: T * D]
        ).reshape(T, D)

        final = _chain_dp(
            class_mask, pair_cost, fid_cost, pos_cost, exact_mask, T, D
        )

        # ExactAttribute rank, computed per words level then gathered by each
        # doc's own level (reference exact_attribute.rs; the rank sits between
        # position and exactness in the default rule order)
        ea_rank = (
            jnp.full((T + 1) * D + ai.shape[0], 2, jnp.int8)
            .at[ai]
            .min(av)[: (T + 1) * D]
        )
        level = jnp.clip(T - final[0], 0, T)
        ea = ea_rank[level * D + jnp.arange(D)].astype(jnp.int32)

        valid_scatter = (
            jnp.zeros(D + vi.shape[0], bool).at[vi].set(True)[:D]
        )
        valid = jnp.where(uv, valid_scatter, live)
        invalid = (~valid) | (final[0] >= INF32)

        w = jnp.clip(final[0], 0, 15)
        ty = jnp.clip(final[1], 0, 63)
        px = jnp.clip(final[2], 0, 255)
        fd = jnp.clip(final[3], 0, 4095)
        ps = jnp.clip(final[4], 0, 4095)
        ex = jnp.clip(final[5], 0, 255)
        key_hi = (w << 26) | (ty << 20) | (px << 12) | fd
        key_hi = jnp.where(invalid, jnp.int32(1 << 30), key_hi)
        key_lo = (ps << 10) | (ea << 8) | ex
        docids = jnp.arange(D, dtype=jnp.int32)
        _, _, sorted_docs = jax.lax.sort(
            (key_hi, key_lo, docids), num_keys=3
        )
        count = jnp.sum(~invalid).astype(jnp.int32)
        top = jnp.where(jnp.arange(k) < count, sorted_docs[:k], -1)
        return top, count

    return jax.vmap(
        one,
        in_axes=(0,) * 13,
    )(
        class_idx,
        pair_idx,
        pair_val,
        adj,
        fid_idx,
        fid_val,
        pos_idx,
        pos_val,
        exact_idx,
        ea_idx,
        ea_val,
        valid_idx,
        use_valid,
    )


def bucket(n: int, minimum: int = 64) -> int:
    """Pow4 ladder to bound the number of compiled variants."""
    b = minimum
    while b < n:
        b *= 4
    return b
