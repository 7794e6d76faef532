"""Batched device execution of chain queries (round 3: packed planes,
sort/facets/distinct on the device path).

The serving-side half of ops/arena_scorer.py: each eligible Search compiles
to a descriptor of ROW INDICES into the store's device-resident plane pool
(index/device_arena.py) — packed per-(term,class) cost planes, pair
proximity planes, ExactAttribute rank planes and sort-rank planes, built
once per generation. Descriptors run MAX_BATCH at a time as ONE device
execute, amortizing the fixed ~27 ms tunnel dispatch across the batch
(SURVEY §2.6 "batched query execution"; replaces the reference's
one-core-per-search model, search_queue.rs:31).

Round-3 widening (VERDICT r2 "narrow device-servable query class"):

  * sort queries (plain field Asc/Desc criteria at the default `sort`
    rule position) select on the above-sort key bits with a quantized
    sort-rank tie pass; the host reconstructs the exact
    (relevance, sort values, exactness, docid) order from the returned
    full keys + its dense sort columns, and falls back to the host
    scorer for the rare page the quantization cannot prove exact;
  * facet-distribution queries fetch the kernel's device-resident full
    candidate bitmap (one 128 KB row per facet query, not per batch)
    and the perform layer bulk-counts facet values against it;
  * distinct queries post-apply the reference's first-per-value rule on
    the exact ranked list when the full candidate set fits in TOPK
    (falling back to the host scorer beyond that).

Round-4 widening: PHRASE terms (explicit "..." queries, split-words and
synonym phrases) ride the device path — phrase docids resolve host-side
into the same packed planes; phrase nodes are MANDATORY in the DP (a
per-term flag rides next to the adjacency flags), pair proximity goes
through the phrase's edge words constrained to the phrase docids, and
fid/position attribute through the first word (host-scorer parity:
scorer._pair_cost/_fid_entries/_pos_entries).

Round-5 widening: matchingStrategy=all rides the device path (every
term mandatory — the DP skip transitions never fire, candidates are
docs matching all terms, words bits uniformly 0).

Everything else (ngram derivations, score details, custom ranking
rules, matchingStrategy=frequency, dynamic rules, >6-term chains)
falls back to the host scorer, per query.
"""

from __future__ import annotations

import os
import threading as _threading
import time as _time
from dataclasses import dataclass, field as dc_field
from typing import Optional

import numpy as np

from ..index.arrays import EMPTY, docids_array, to_array, union_many
from ..index.device_arena import (
    get_arena,
    pack_bitmap,
    pair_plane,
    sort_plane,
    term_plane,
    unpack_bitmap,
    byte_plane,
)
from ..index.store import IndexStore
from .executor import Search, SearchResult, exact_attribute_rank_ids
from .graph import QueryGraph
from .query_terms import DerivationContext, located_query_terms_from_tokens
from .scorer import Resolver, position_cost_from_distance

MAX_T = 6  # the packed int32 rank key needs T <= 6 (ops/arena_scorer.py)
TOPK = 1024
# drain width cap: the Pallas grid is (B, word-blocks) so B scales
# freely; wider drains amortize the fixed ~30 ms dispatch+readback over
# more queries (MEILI_TPU_MAX_BATCH to experiment)
MAX_BATCH = int(os.environ.get("MEILI_TPU_MAX_BATCH", "32"))
# compiled scoring-program ladder per corpus bucket: the Pallas scorer
# compiles in ~10 s per variant (vs 100-400 s for the round-2 XLA
# monolith, which forced a two-variant discipline), so the ladder now
# matches the query distribution — most queries are 1-3 terms and the
# DP cost scales with T, and light drains ride a narrow batch instead
# of padding to MAX_BATCH
T_LADDER = (1, 2, 3, 4, MAX_T)
B_LADDER = tuple(
    [b for b in (8, 32) if b < MAX_BATCH] + [MAX_BATCH]
)


def _ladder_B(n: int) -> int:
    for lb in B_LADDER:
        if n <= lb:
            return lb
    return MAX_BATCH


def _ladder_T(t: int) -> int:
    for lt in T_LADDER:
        if t <= lt:
            return lt
    return MAX_T
MAX_PLANE_DOCS = 1 << 23  # beyond ~8M docs the dense planes go host-side


def _pad_descriptor(d: "ChainDescriptor", T: int) -> "ChainDescriptor":
    """Pad a descriptor up to the drain's selected ladder width T; compiled
    variants are per (D, T, B) along T_LADDER x B_LADDER (the ~10 s Pallas
    compile makes a small ladder affordable, vs the round-2 two-variant
    discipline when a cold XLA monolith cost 30-290 s over the tunnel).
    Padding appends match-nothing terms whose only path is the skip edge,
    which shifts every document's words-cost by the same constant —
    per-query ordering and validity are unchanged (the DP forbids skipping
    ALL terms)."""
    if d.T == T:
        return d
    tp = max(T - 1, 1)
    term_rows = np.zeros((T, 3), np.int32)
    term_rows[: d.T] = d.term_rows
    pair_rows = np.zeros((tp, 3), np.int32)
    pair_rows[: max(d.T - 1, 1)] = d.pair_rows
    ea_rows = np.zeros(T + 1, np.int32)
    ea_rows[: d.T + 1] = d.ea_rows
    adj = np.zeros(tp, dtype=bool)
    adj[: max(d.T - 1, 1)] = d.adj
    if d.T == 1:
        adj[0] = False  # d.adj is a (1,) placeholder when T == 1
    mand = np.zeros(T, dtype=bool)
    mand[: d.T] = d.mand  # padding terms are skippable (skip-only path)
    return ChainDescriptor(
        T=T,
        term_rows=term_rows,
        pair_rows=pair_rows,
        ea_rows=ea_rows,
        adj=adj,
        mand=mand,
        sort_row=d.sort_row,
        sort_criteria=d.sort_criteria,
        distinct_field=d.distinct_field,
        universe_ids=d.universe_ids,
        located_terms=d.located_terms,
        search=d.search,
        want_mask=d.want_mask,
        universe_packed=d.universe_packed,
        chain_info=d.chain_info,
        graph=d.graph,
    )


DEFAULT_RULES = [
    ("graph", "words"),
    ("graph", "typo"),
    ("graph", "proximity"),
    ("graph", "fid"),
    ("graph", "position"),
    ("exact_attribute",),
    ("graph", "exactness"),
]
# with a sort, the default criteria place every sort criterion between
# attributeRank (fid) and wordPosition (reference criterion.rs:121
# default_criteria)
_SORT_RULE_POS = 4


@dataclass
class ChainDescriptor:
    T: int
    term_rows: np.ndarray  # (T, 3) byte-pool rows: packed exact|fid|pos
    pair_rows: np.ndarray  # (tp, 3) byte-pool rows: 2-bit costs per class
    ea_rows: np.ndarray  # (T + 1,)
    adj: np.ndarray  # (tp,) bool
    mand: np.ndarray  # (T,) bool — mandatory terms (graph.py
    # _removal_groups: phrase nodes, else the costliest group = term 0)
    sort_row: int  # byte-pool row of the first sort criterion (0 = none)
    sort_criteria: list  # [(field, asc)] parsed criteria ([] = no sort)
    distinct_field: Optional[str]
    universe_ids: Optional[np.ndarray]  # filter universe or None (= live)
    located_terms: list
    search: Search
    want_mask: bool = False  # fetch the full candidate bitmap (facets)
    universe_packed: "Optional[np.ndarray]" = None  # memoized pack_bitmap
    # host-overlay inputs (minor-write delta scoring, score_delta)
    chain_info: list = dc_field(default_factory=list)  # [(term, start_pos)]
    graph: object = None
    # per chain node: list of class-docids arrays (the resolve checks of
    # graph_max_cost when decoding _rankingScore from the packed key)
    node_class_ids: dict = dc_field(default_factory=dict)


def _subset_words(resolver: Resolver, term, cls: int) -> list[str]:
    return [w for w, _ in resolver.class_words(term, cls)]


def _prefix_words(resolver: Resolver, term, cls: int) -> list[str]:
    if cls == 0 and term.use_prefix_db is not None:
        return resolver.prefix_words(term.use_prefix_db)
    return []


def _parse_sort_criteria(search: Search):
    """[(field, asc)] when every criterion is a plain-field Asc/Desc and
    the assembled rules are DEFAULT + sort at the default position; None
    when the query cannot ride the device."""
    rules = search._assembled_rules(for_query=True)
    # matchingStrategy=all drops the words rule from the assembled order
    # (executor.py:234; the packed key's words bits are uniformly 0 under
    # all-mandatory terms, so the key order still matches)
    base = (
        DEFAULT_RULES[1:]
        if search.terms_matching_strategy == "all"
        else DEFAULT_RULES
    )
    sort_pos = _SORT_RULE_POS - (len(DEFAULT_RULES) - len(base))
    if not search.sort_criteria:
        return [] if rules == base else None
    sort_entries = [r for r in rules if r[0] == "sort_field"]
    if any(r[0] == "geo" for r in rules):
        return None
    expected = base[:sort_pos] + sort_entries + base[sort_pos:]
    if rules != expected or not sort_entries:
        return None
    return [(f, asc) for _tag, f, asc in sort_entries]


def _universe_cache(store, D):
    from collections import OrderedDict

    cache = getattr(store, "_universe_lru", None)
    if cache is None or cache[0] != (store.generation, D):
        cache = ((store.generation, D), OrderedDict())
        store._universe_lru = cache
    return cache[1]


def _universe_cache_get(store, filter_arr, D):
    lru = _universe_cache(store, D)
    ent = lru.get(id(filter_arr))
    # the keepalive reference in the entry guarantees id() stays unique
    if ent is not None and ent[0] is filter_arr:
        lru.move_to_end(id(filter_arr))
        return ent[1], ent[2]
    return None


def _universe_cache_put(store, filter_arr, D, universe, packed):
    lru = _universe_cache(store, D)
    lru[id(filter_arr)] = (filter_arr, universe, packed)
    if len(lru) > 256:
        lru.popitem(last=False)


def _assemble_universe(store, D: int, B: int, filt):
    """Device-resident (B, D/32) packed filter-universe stack.

    A host (B, D/32) numpy argument costs ~125 ms per drain at B=32,
    D=2^20 through the TPU tunnel (measured 152 ms/call vs 27 ms for the
    same 4 MB operand device-resident), and it was shipped on EVERY
    drain even when no query had a filter. Assemble on device instead: a
    cached all-zeros base plus one 128 KB row upload per DISTINCT filter
    (memoized per generation via the universe LRU identity), scattered
    with an eager .at[].set that stays device-side. Filter-free drains —
    and repeat drains with the same filters — upload nothing.

    `filt` is [(slot, packed_row)] for rows that need a non-zero
    universe; padding/match-nothing rows stay on the zeros base."""
    import jax.numpy as jnp

    zkey = (store.generation, D, B)
    cached = getattr(store, "_device_universe_zeros", None)
    if cached is None or cached[0] != zkey:
        cached = (zkey, jnp.zeros((B, D // 32), jnp.int32))
        store._device_universe_zeros = cached
    base = cached[1]
    if not filt:
        return base

    akey = (zkey, tuple((i, id(row)) for i, row in filt))
    asm = getattr(store, "_device_universe_asm", None)
    if asm is None or not isinstance(asm, dict):
        asm = {}
        store._device_universe_asm = asm
    ent = asm.get(akey)
    # keepalive rows in the entry guarantee the id()s stay unique
    if ent is not None and all(a is b for (_, a), b in zip(filt, ent[0])):
        return ent[1]

    rows_lru = getattr(store, "_device_universe_rows", None)
    if rows_lru is None or rows_lru[0] != zkey[:2]:
        from collections import OrderedDict

        rows_lru = (zkey[:2], OrderedDict())
        store._device_universe_rows = rows_lru
    lru = rows_lru[1]
    dev_rows = []
    for _slot, row in filt:
        rent = lru.get(id(row))
        if rent is None or rent[0] is not row:
            rent = (row, jnp.asarray(row))
            lru[id(row)] = rent
            if len(lru) > 256:
                lru.popitem(last=False)
        else:
            lru.move_to_end(id(row))
        dev_rows.append(rent[1])
    out = base.at[np.array([i for i, _ in filt]), :].set(jnp.stack(dev_rows))
    if len(asm) > 8:
        asm.clear()
    asm[akey] = ([row for _, row in filt], out)
    return out


def _device_struct_cache(store) -> dict:
    """Base-anchored cache for device-row source structures (the unions
    behind the planes). Entries built at ANY point >= the base are valid
    for base docids — delta docids are masked out of the kernel and
    scored by the host overlay — so MINOR writes don't flush this (the
    round-2 'first query after a write re-unions everything' stall)."""
    c = getattr(store, "_device_struct_cache_v", None)
    if c is None or c[0] != store.base_generation:
        c = (store.base_generation, {})
        store._device_struct_cache_v = c
    return c[1]


def _delta_struct_cache(store) -> dict:
    """Per-generation cache for the host-overlay structures (delta docid
    membership masks per term class / pair / ea). The delta set and the
    tables are stable within a generation."""
    c = getattr(store, "_delta_struct_cache_v", None)
    if c is None or c[0] != store.generation:
        c = (store.generation, {})
        store._delta_struct_cache_v = c
    return c[1]


def _sort_plane_host(store, field: str, asc: bool) -> np.ndarray:
    """Host copy of the quantized sort-rank plane (shared with the device
    row build; also used for the exactness proof in the sort merge —
    base-anchored so host proof and resident row always agree)."""
    from ..index.arrays import facet_arrays

    cache = _device_struct_cache(store)
    key = ("sortplane", field, asc)
    plane = cache.get(key)
    if plane is None:
        D = _plane_docs(store)
        fid = store.fields_ids_map.id(field)
        groups: list[np.ndarray] = []
        if fid is not None:
            fa = facet_arrays(store, fid)
            nums = list(fa.num_arrays)
            strs = list(fa.str_arrays)
            if not asc:
                nums.reverse()
                strs.reverse()
            groups = nums + strs  # numbers always order before strings
        plane = sort_plane(D, groups)
        cache[key] = plane
    return plane


def build_descriptor(search: Search) -> Optional[ChainDescriptor]:
    store = search.store
    settings = store.settings
    if (
        # showRankingScore decodes exactly from the packed key bit fields
        # (_device_scores); details rendering and threshold-total
        # semantics (which need scores for EVERY candidate, not just the
        # top-k page) stay on the host scorer
        search.compute_score_details
        or search.ranking_score_threshold is not None
        or search.attributes_to_search_on is not None
        or search.terms_matching_strategy not in ("last", "all")
        or not (search.query and search.query.strip())
        or search.offset + search.limit > TOPK
    ):
        return None
    sort_criteria = _parse_sort_criteria(search)
    if sort_criteria is None:
        return None
    if sort_criteria:
        # unsortable fields must raise exactly as on the host path; the
        # raised EngineError routes this query to the host scorer, which
        # re-raises it to the caller
        search._check_sort_criteria()
    distinct_field = search.distinct or settings.distinct_attribute
    if distinct_field is not None and store.fields_ids_map.id(
        distinct_field
    ) is None:
        distinct_field = None  # unknown field: distinct is a no-op
    if getattr(store, "dynamic_rules", None) and store.dynamic_rules.rules:
        return None

    D = _plane_docs(store)
    if D > MAX_PLANE_DOCS:
        return None
    arena = get_arena(store, D)

    ctx = DerivationContext(store, settings)
    tokenizer = store.make_tokenizer(search.locales)
    extracted = located_query_terms_from_tokens(ctx, tokenizer, search.query)
    terms = list(extracted.query_terms)
    if not terms:
        return None

    resolver = Resolver(store, EMPTY, None)
    universe = None
    universe_packed = None
    if (
        search.filter_docids is not None
        or extracted.negative_words
        or extracted.negative_phrases
    ):
        from ..index.arrays import difference, intersect

        plain_filter = (
            search.filter_docids is not None
            and isinstance(search.filter_docids, np.ndarray)
            and not extracted.negative_words
            and not extracted.negative_phrases
        )
        if plain_filter:
            # the filter array object is stable across requests (the
            # evaluate_filter LRU returns the same generation-immutable
            # array), so the intersect + packbits pipeline memoizes on its
            # identity — at 1M docs it costs a few ms per query otherwise
            cached = _universe_cache_get(store, search.filter_docids, D)
            if cached is not None:
                universe, universe_packed = cached
        if universe is None:
            universe = docids_array(store)
            if search.filter_docids is not None:
                universe = intersect(universe, to_array(search.filter_docids))
            for w in extracted.negative_words:
                universe = difference(
                    universe, resolver.word_docids(w, original=True)
                )
            for p in extracted.negative_phrases:
                universe = difference(universe, resolver.phrase_docids(p))
            if plain_filter:
                universe_packed = pack_bitmap(universe, D)
                _universe_cache_put(
                    store, search.filter_docids, D, universe, universe_packed
                )

    graph = QueryGraph.from_terms(ctx, terms)
    chain = []
    for node in graph.term_nodes():
        lt = node.located
        term = lt.term
        if lt.term_ids_len > 1:
            # an ngram node is only tolerable when it has no derivations
            if term.use_prefix_db is not None:
                return None
            if any(term.words_for_class(c) for c in range(3)):
                return None
            if term.phrases_for_class(0) or term.phrases_for_class(1):
                return None
            continue
        chain.append(node)
    chain.sort(key=lambda nd: nd.located.start_term_id)
    T = len(chain)
    if T == 0 or T > MAX_T:
        return None

    # mandatory terms (graph.py _removal_groups / reference
    # query_graph.rs:379): phrase nodes never get a removal group; when
    # none exist the costliest group — the FIRST term under `last` — is
    # popped instead. Mandatory = unskippable + visitable after a skip.
    mand = np.array(
        [nd.located.term.phrase is not None for nd in chain], dtype=bool
    )
    if search.terms_matching_strategy == "all":
        # matchingStrategy=all: every term mandatory — the DP's skip
        # transitions never fire, so candidates = docs matching ALL terms
        # and the words-rule bits are uniformly 0, exactly the host/
        # reference semantics (executor.py:234; query_graph.rs:379 "All
        # terms matching strategy: no removal buckets")
        mand[:] = True
    elif not mand.any():
        mand[0] = True

    weight_map = store.fid_weight_map()
    if any(w > 7 for w in weight_map.values()):
        return None  # weights must fit the packed int32 rank key

    gcache = _device_struct_cache(store)
    tp = max(T - 1, 1)
    term_rows = np.zeros((T, 3), dtype=np.int32)
    pair_rows = np.zeros((tp, 3), dtype=np.int32)
    ea_rows = np.zeros(T + 1, dtype=np.int32)

    def class_ids(term, tkey, cls):
        ids = gcache.get(("dcls", tkey, cls))
        if ids is None:
            ids = resolver.term_class_docids(term, cls)
            gcache[("dcls", tkey, cls)] = ids
        return ids

    def fidpos_entry(term, tkey, cls):
        entry = gcache.get(("dfidpos", tkey, cls))
        if entry is None:
            from ..index.arrays import intersect

            words = _subset_words(resolver, term, cls)
            pwords = _prefix_words(resolver, term, cls)
            all_w = words + pwords
            # phrases (explicit "..." terms, split-words, synonym phrases)
            # attribute through their FIRST word restricted to the phrase
            # docids (host parity: scorer._fid_entries/_pos_entries,
            # reference fid/mod.rs + position/mod.rs)
            phrases = [
                (p, first)
                for p in resolver.class_phrases(term, cls)
                for first in [next((w for w in p if w is not None), None)]
                if first is not None
            ]
            fid_list = []
            fids: set[int] = set()
            for w in all_w:
                fids |= resolver.fids_by_word.get(w, set())
            for _p, first in phrases:
                fids |= resolver.fids_by_word.get(first, set())
            for fid in fids:
                weight = weight_map.get(fid)
                if weight is None:
                    continue
                parts = [resolver.word_fid_docids(w, fid) for w in all_w]
                for p, first in phrases:
                    wd = resolver.word_fid_docids(first, fid)
                    if len(wd):
                        parts.append(
                            intersect(resolver.phrase_docids(p), wd)
                        )
                arr = union_many(parts)
                if len(arr):
                    fid_list.append((arr, weight))
            pos_list = []
            buckets: set[int] = set()
            for w in all_w:
                buckets |= resolver.buckets_by_word.get(w, set())
            for _p, first in phrases:
                buckets |= resolver.buckets_by_word.get(first, set())
            for b in buckets:
                parts = [
                    resolver.word_position_docids(w, b) for w in all_w
                ]
                for p, first in phrases:
                    wd = resolver.word_position_docids(first, b)
                    if len(wd):
                        parts.append(
                            intersect(resolver.phrase_docids(p), wd)
                        )
                arr = union_many(parts)
                if len(arr):
                    pos_list.append((arr, b))
            entry = (fid_list, pos_list)
            gcache[("dfidpos", tkey, cls)] = entry
        return entry

    node_class_ids: dict = {}
    for t, node in enumerate(chain):
        term = node.located.term
        start_pos = node.located.start_position
        tkey = (
            term.original, term.is_prefix, term.use_prefix_db, term.phrase
        )
        node_class_ids[node.node_id] = [
            class_ids(term, tkey, cls)
            for cls in range(term.max_typo_cost() + 1)
        ]
        exact_ids = None
        if term.phrase is not None:
            # exactness for a phrase term = the phrase docids
            # (scorer._exactness_addend, reference exactness/mod.rs)
            exact_ids = resolver.phrase_docids(term.phrase)
        elif term.exact is not None:
            exact_ids = resolver.word_docids(term.exact, original=True)
        for cls in range(term.max_typo_cost() + 1):
            ids = class_ids(term, tkey, cls)
            if not len(ids):
                continue

            def build_term(
                term=term, tkey=tkey, cls=cls, sp=start_pos,
                ids=ids, exact_ids=exact_ids,
            ):
                fid_list, pos_list = fidpos_entry(term, tkey, cls)
                return term_plane(
                    D,
                    ids,
                    fid_list,
                    [
                        (a, position_cost_from_distance(abs(b - sp)))
                        for a, b in pos_list
                    ],
                    exact_ids=exact_ids if cls == 0 else None,
                )

            term_rows[t, cls] = arena.byte_row(
                ("term", tkey, cls, start_pos), build_term
            )

    adj = np.zeros(tp, dtype=bool)
    for t in range(1, T):
        left, right = chain[t - 1], chain[t]
        adjacent = (
            left.located.end_position + 1 == right.located.start_position
        )
        adj[t - 1] = adjacent
        if not adjacent:
            continue
        lterm, rterm = left.located.term, right.located.term
        pkey = (
            lterm.original,
            lterm.is_prefix,
            lterm.use_prefix_db,
            lterm.phrase,
            rterm.original,
            rterm.is_prefix,
            rterm.use_prefix_db,
            rterm.phrase,
        )

        def pair_parts(pc, c, lterm=lterm, rterm=rterm, pkey=pkey):
            """Host-parity proximity parts (scorer._pair_cost, reference
            proximity/build.rs + compute_docids.rs): phrase terms pair via
            their LAST word (left) / FIRST word (right) intersected with
            the phrase docids; backward pairs only between plain words."""
            from ..index.arrays import intersect

            lpairs = [
                (None, w) for w in _subset_words(resolver, lterm, pc)
            ] + [
                (p, p[-1])
                for p in resolver.class_phrases(lterm, pc)
                if p[-1] is not None
            ]
            rpairs = [
                (w, None) for w in _subset_words(resolver, rterm, c)
            ] + [
                (p[0], p)
                for p in resolver.class_phrases(rterm, c)
                if p[0] is not None
            ]
            rprefix = _prefix_words(resolver, rterm, c)
            parts = []
            for rel in (0, 1, 2):
                arr = gcache.get(("dpair", pkey, pc, c, rel))
                if arr is None:
                    fwd, bwd = rel + 1, rel
                    pieces = []
                    if rprefix:
                        for lph, lw in lpairs:
                            lcon = (
                                resolver.phrase_docids(lph)
                                if lph is not None
                                else None
                            )
                            if lcon is not None and not len(lcon):
                                continue
                            acc_parts = [
                                resolver.pair_proximity_docids(fwd, lw, w)
                                for w in rprefix
                            ]
                            if lph is None and bwd >= 1:
                                acc_parts.append(
                                    resolver.pair_proximity_docids(
                                        bwd, rterm.use_prefix_db, lw
                                    )
                                )
                            acc = union_many(acc_parts)
                            if lcon is not None:
                                acc = intersect(acc, lcon)
                            pieces.append(acc)
                    for lph, lw in lpairs:
                        for rw, rph in rpairs:
                            constraint = None
                            for p in (lph, rph):
                                if p is not None:
                                    pd = resolver.phrase_docids(p)
                                    constraint = (
                                        pd
                                        if constraint is None
                                        else intersect(constraint, pd)
                                    )
                            if constraint is not None and not len(
                                constraint
                            ):
                                continue
                            acc_parts = [
                                resolver.pair_proximity_docids(fwd, lw, rw)
                            ]
                            if bwd >= 1 and lph is None and rph is None:
                                acc_parts.append(
                                    resolver.pair_proximity_docids(
                                        bwd, rw, lw
                                    )
                                )
                            acc = union_many(acc_parts)
                            if constraint is not None:
                                acc = intersect(acc, constraint)
                            pieces.append(acc)
                    arr = union_many(pieces)
                    gcache[("dpair", pkey, pc, c, rel)] = arr
                if len(arr):
                    parts.append((arr, rel))
            return parts

        for pc in range(lterm.max_typo_cost() + 1):

            def build_pair(pc=pc, rterm=rterm):
                return pair_plane(
                    D,
                    [
                        pair_parts(pc, c)
                        if c <= rterm.max_typo_cost()
                        else []
                        for c in range(3)
                    ],
                )

            pair_rows[t - 1, pc] = arena.byte_row(
                ("pair", pkey, pc), build_pair
            )

    # ExactAttribute rank planes per words level. Rank is pointwise per
    # document (exact_attribute_rank_ids only uses the universe to restrict
    # candidates), so the global answer is cacheable and the kernel's valid
    # mask applies the per-query filter.
    uni = docids_array(store)
    ea_key_base = tuple(n.located.term.original for n in chain)
    for k in range(1, T + 1):

        def build_ea(k=k):
            ranks = gcache.get(("dea", ea_key_base, k))
            if ranks is None:
                ranks = exact_attribute_rank_ids(store, graph, k, uni, resolver)
                gcache[("dea", ea_key_base, k)] = ranks
            rank0, rank1 = ranks
            parts = []
            if len(rank1):
                parts.append((rank1, 1))
            if len(rank0):
                parts.append((rank0, 0))
            return byte_plane(parts, D, 2)

        ea_rows[k] = arena.byte_row(("ea", ea_key_base, k), build_ea)

    sort_row = 0
    if sort_criteria:
        f0, asc0 = sort_criteria[0]
        sort_row = arena.byte_row(
            ("sort", f0, asc0),
            lambda f0=f0, asc0=asc0: _sort_plane_host(store, f0, asc0),
        )

    return ChainDescriptor(
        T=T,
        term_rows=term_rows,
        pair_rows=pair_rows,
        ea_rows=ea_rows,
        adj=adj,
        mand=mand,
        sort_row=sort_row,
        sort_criteria=sort_criteria,
        distinct_field=distinct_field,
        universe_ids=universe,
        located_terms=[n.located for n in graph.term_nodes()],
        search=search,
        # scores need the candidate bitmap for graph_max_cost's
        # node-resolves checks (host parity: _node_resolves over the
        # resolved universe == the DP's candidate set)
        want_mask=bool(search.facets) or search.compute_scores,
        universe_packed=universe_packed,
        chain_info=[
            (n.located.term, n.located.start_position) for n in chain
        ],
        graph=graph,
        node_class_ids=node_class_ids,
    )


# -- batch assembly -------------------------------------------------------------


def _plane_docs(store: IndexStore) -> int:
    d = max(store._next_docid, 1)
    return 1 << (d - 1).bit_length() if d > 1024 else 1024


def _live_mask(store: IndexStore, D: int):
    """Packed (D/32,) int32 bit-blocked live bitmap, device-resident
    (pack_bitmap layout — the kernel input form for both scorer paths)."""
    import jax.numpy as jnp

    cached = getattr(store, "_device_live_cache", None)
    if cached is not None and cached[0] == (store.generation, D):
        return cached[1]
    live = np.zeros(D, dtype=bool)
    live[docids_array(store)] = True
    if store.delta_docids:
        # delta docids are served by the host overlay (score_delta), not
        # by the (stale-for-them) base-anchored device rows
        live[
            np.fromiter(
                store.delta_docids, np.int64, len(store.delta_docids)
            )
        ] = False
    rows = live.reshape(32, D // 32).astype(np.uint32)
    packed = (
        (rows << np.arange(32, dtype=np.uint32)[:, None])
        .sum(axis=0, dtype=np.uint32)
        .astype(np.int32)
    )
    dev = jnp.asarray(packed)
    store._device_live_cache = ((store.generation, D), dev)
    return dev


def _empty_descriptor(T: int, search: Search) -> ChainDescriptor:
    """Batch-padding descriptor: matches nothing (row 0 = all-absent
    plane, use_valid with the all-zero universe -> every doc invalid)."""
    tp = max(T - 1, 1)
    mand = np.zeros(T, dtype=bool)
    mand[0] = True  # forbids the all-skip path (as on any plain chain)
    return ChainDescriptor(
        T=T,
        term_rows=np.zeros((T, 3), np.int32),
        pair_rows=np.zeros((tp, 3), np.int32),
        ea_rows=np.zeros(T + 1, np.int32),
        adj=np.zeros(tp, dtype=bool),
        mand=mand,
        sort_row=0,
        sort_criteria=[],
        distinct_field=None,
        universe_ids=EMPTY,
        located_terms=[],
        search=search,
    )


def _delta_ids_array(store: IndexStore) -> np.ndarray:
    """Sorted LIVE delta docids (cached per generation)."""
    cache = _delta_struct_cache(store)
    arr = cache.get("ids")
    if arr is None:
        from ..index.arrays import intersect

        arr = intersect(
            to_array(store.delta_docids), docids_array(store)
        )
        cache["ids"] = arr
    return arr


def score_delta(
    store: IndexStore,
    d: ChainDescriptor,
    delta_ids: np.ndarray,
    T: int = MAX_T,
) -> tuple[np.ndarray, np.ndarray]:
    """The host overlay of incremental generations: exact packed rank keys
    for the minor-write delta docids, byte-identical to the device kernel
    (ops/arena_scorer.packed_chain_dp_np mirrors _packed_chain_dp; the
    device live mask excludes these docids). Membership runs per posting
    key over the CURRENT tables — O(|delta| log n) per key — and the
    per-(term, class) masks cache per generation (_delta_struct_cache),
    so warm post-write queries pay microseconds here."""
    from ..index.arrays import member_mask
    from ..ops.arena_scorer import packed_chain_dp_np

    n = len(delta_ids)
    tp = T - 1
    resolver = Resolver(store, EMPTY, None)
    weight_map = store.fid_weight_map()
    cache = _delta_struct_cache(store)

    def mm(arr):
        return member_mask(delta_ids, arr)

    def phrase_arr(p):
        key = ("phrase", p)
        arr = cache.get(key)
        if arr is None:
            arr = resolver.phrase_docids(p)
            cache[key] = arr
        return arr

    present = np.zeros((T, 3, n), bool)
    fid_c = np.zeros((T, 3, n), np.int16)
    pos_c = np.zeros((T, 3, n), np.int16)
    exact_m = np.zeros((T, n), bool)
    pair_c = np.full((tp, 3, 3, n), 3, np.int16)

    chain = d.chain_info
    for t, (term, start_pos) in enumerate(chain):
        tkey = (
            term.original, term.is_prefix, term.use_prefix_db, term.phrase
        )
        if term.phrase is not None:
            # exactness for a phrase term = the phrase docids
            exact_m[t] = mm(phrase_arr(term.phrase))
        elif term.exact is not None:
            key = ("dex", term.exact)
            m = cache.get(key)
            if m is None:
                m = mm(resolver.word_docids(term.exact, original=True))
                cache[key] = m
            exact_m[t] = m
        for cls in range(term.max_typo_cost() + 1):
            key = ("dterm", tkey, cls, start_pos)
            entry = cache.get(key)
            if entry is None:
                words = resolver.class_words(term, cls)
                pres = np.zeros(n, bool)
                for w, original in words:
                    pres |= mm(resolver.word_docids(w, original))
                for p in resolver.class_phrases(term, cls):
                    pres |= mm(phrase_arr(p))
                all_w = [w for w, _o in words]
                if cls == 0 and term.use_prefix_db is not None:
                    is_orig = term.ngram_words is None
                    pw = resolver.prefix_words(term.use_prefix_db)
                    for w in pw:
                        pres |= mm(resolver.word_docids(w, is_orig))
                    all_w = all_w + pw
                INF16 = np.int16(0x7FFF // 2)
                fmin = np.full(n, INF16, np.int16)
                pmin = np.full(n, INF16, np.int16)
                for w in all_w:
                    for fid in resolver.fids_by_word.get(w, ()):
                        weight = weight_map.get(fid)
                        if weight is None:
                            continue
                        m = mm(resolver.word_fid_docids(w, fid))
                        fmin = np.where(
                            m, np.minimum(fmin, np.int16(weight)), fmin
                        )
                    for b in resolver.buckets_by_word.get(w, ()):
                        m = mm(resolver.word_position_docids(w, b))
                        cost = position_cost_from_distance(abs(b - start_pos))
                        pmin = np.where(
                            m, np.minimum(pmin, np.int16(cost)), pmin
                        )
                # phrases attribute through their first word restricted
                # to the phrase docids (host scorer._fid/_pos_entries)
                for p in resolver.class_phrases(term, cls):
                    first = next((w for w in p if w is not None), None)
                    if first is None:
                        continue
                    pmask = mm(phrase_arr(p))
                    if not pmask.any():
                        continue
                    for fid in resolver.fids_by_word.get(first, ()):
                        weight = weight_map.get(fid)
                        if weight is None:
                            continue
                        m = pmask & mm(resolver.word_fid_docids(first, fid))
                        fmin = np.where(
                            m, np.minimum(fmin, np.int16(weight)), fmin
                        )
                    for b in resolver.buckets_by_word.get(first, ()):
                        m = pmask & mm(
                            resolver.word_position_docids(first, b)
                        )
                        cost = position_cost_from_distance(abs(b - start_pos))
                        pmin = np.where(
                            m, np.minimum(pmin, np.int16(cost)), pmin
                        )
                # absent fid/pos decode to 0 in the packed plane (the
                # int8 row defaults its low bits to 0 for in-class docs)
                fplane = np.where(fmin == INF16, 0, np.minimum(fmin, 7))
                pplane = np.where(pmin == INF16, 0, np.minimum(pmin, 15))
                entry = (pres, fplane.astype(np.int16), pplane.astype(np.int16))
                cache[key] = entry
            present[t, cls], fid_c[t, cls], pos_c[t, cls] = entry

    for t in range(1, len(chain)):
        if not d.adj[t - 1]:
            pair_c[t - 1] = 0  # free term edge when not adjacent
            continue
        (lterm, _lp), (rterm, _rp) = chain[t - 1], chain[t]
        pkey = (
            lterm.original, lterm.is_prefix, lterm.use_prefix_db,
            lterm.phrase,
            rterm.original, rterm.is_prefix, rterm.use_prefix_db,
            rterm.phrase,
        )
        for pc in range(lterm.max_typo_cost() + 1):
            for c in range(rterm.max_typo_cost() + 1):
                key = ("dpairm", pkey, pc, c)
                row = cache.get(key)
                if row is None:
                    # phrase terms pair via last word (left) / first word
                    # (right) within the phrase docids (scorer._pair_cost)
                    lpairs = [
                        (None, w) for w in _subset_words(resolver, lterm, pc)
                    ] + [
                        (p, p[-1])
                        for p in resolver.class_phrases(lterm, pc)
                        if p[-1] is not None
                    ]
                    rpairs = [
                        (w, None) for w in _subset_words(resolver, rterm, c)
                    ] + [
                        (p[0], p)
                        for p in resolver.class_phrases(rterm, c)
                        if p[0] is not None
                    ]
                    rprefix = _prefix_words(resolver, rterm, c)
                    row = np.full(n, 3, np.int16)
                    for rel in (2, 1, 0):  # descending: lower rel wins
                        fwd, bwd = rel + 1, rel
                        m = np.zeros(n, bool)
                        if rprefix:
                            for lph, lw in lpairs:
                                lcon = (
                                    mm(phrase_arr(lph))
                                    if lph is not None
                                    else None
                                )
                                acc = np.zeros(n, bool)
                                for w in rprefix:
                                    acc |= mm(
                                        resolver.pair_proximity_docids(
                                            fwd, lw, w
                                        )
                                    )
                                if lph is None and bwd >= 1:
                                    acc |= mm(
                                        resolver.pair_proximity_docids(
                                            bwd, rterm.use_prefix_db, lw
                                        )
                                    )
                                if lcon is not None:
                                    acc &= lcon
                                m |= acc
                        for lph, lw in lpairs:
                            for rw, rph in rpairs:
                                con = None
                                for p in (lph, rph):
                                    if p is not None:
                                        pm = mm(phrase_arr(p))
                                        con = pm if con is None else con & pm
                                acc = mm(
                                    resolver.pair_proximity_docids(fwd, lw, rw)
                                )
                                if (
                                    bwd >= 1
                                    and lph is None
                                    and rph is None
                                ):
                                    acc |= mm(
                                        resolver.pair_proximity_docids(
                                            bwd, rw, lw
                                        )
                                    )
                                if con is not None:
                                    acc &= con
                                m |= acc
                        row = np.where(m, np.int16(rel), row)
                    cache[key] = row
                pair_c[t - 1, pc, c] = row

    mand = np.zeros(T, dtype=bool)
    # inherit the descriptor's mandatory flags (phrase terms; all terms
    # under matchingStrategy=all) — padding terms stay skippable
    mand[: len(chain)] = d.mand[: len(chain)]
    key_arr, BIG, sh_ea, sh_w = packed_chain_dp_np(
        present, fid_c, pos_c, pair_c, exact_m, T, mand=mand
    )
    dead = key_arr >= BIG

    # ExactAttribute rank by each doc's words level (kernel mirror)
    Treal = len(chain)
    ea_key_base = tuple(term.original for term, _sp in chain)
    level = np.clip(T - (key_arr >> sh_w), 0, T)
    ea = np.full(n, 2, np.int32)
    for k in range(1, Treal + 1):
        ckey = ("deam", ea_key_base, k)
        entry = cache.get(ckey)
        if entry is None:
            rank0, rank1 = exact_attribute_rank_ids(
                store, d.graph, k, delta_ids, resolver
            )
            entry = (mm(rank0), mm(rank1))
            cache[ckey] = entry
        m0, m1 = entry
        sel = level == k
        ea = np.where(sel & m0, 0, np.where(sel & m1, np.minimum(ea, 1), ea))
    key_arr = key_arr | (ea << sh_ea)

    valid = ~dead
    if d.universe_ids is not None:
        valid &= mm(d.universe_ids)
    sel = np.flatnonzero(valid)
    return delta_ids[sel], key_arr[sel]


class _ShimScorer:
    """max_cost provider for the device finish path: the same
    graph_max_cost dp the host FusedScorer runs, with node-resolve checks
    answered from the query's candidate bitmap (the DP candidate set ==
    the host's resolved universe, so membership tests agree) and
    removability from the graph's removal groups directly."""

    def __init__(self, store, d: ChainDescriptor, cand_mask: np.ndarray):
        self.store = store
        self.d = d
        self.mask = cand_mask
        self._cache: dict = {}
        strategy = d.search.terms_matching_strategy
        groups = (
            d.graph.removal_groups_last() if strategy == "last" else []
        )
        self._removable = {nid for g in groups for nid in g}
        self.strategy = strategy

    def _resolves(self, node) -> bool:
        key = ("res", node.node_id)
        got = self._cache.get(key)
        if got is None:
            got = False
            nd = len(self.mask)
            for ids in self.d.node_class_ids.get(node.node_id, ()):
                if len(ids) and self.mask[ids[ids < nd]].any():
                    got = True
                    break
            self._cache[key] = got
        return got

    def max_cost(self, dim: str, k: int) -> int:
        key = ("maxcost", dim, k)
        if key in self._cache:
            return self._cache[key]
        from .scorer import graph_max_cost

        best = graph_max_cost(
            self.d.graph, self.store, self.strategy, dim, k,
            self._resolves, lambda n: n.node_id in self._removable,
        )
        self._cache[key] = best
        return best


def _device_scores(
    store: IndexStore,
    d: ChainDescriptor,
    T: int,
    ranked: np.ndarray,
    keys: np.ndarray,
    cand_mask: np.ndarray,
) -> dict:
    """Exact `_rankingScore` values for device-served hits, decoded from
    the packed DP key's bit fields (ops/arena_scorer._key_layout) and fed
    through the host's score math (executor._compute_global_scores —
    reference ScoreDetails::global_score, score_details.rs:529). Padding
    terms added by _pad_descriptor shift every doc's words field by the
    same T - d.T constant, subtracted here."""
    from ..ops.arena_scorer import _key_layout

    sh_ea, sh_ps, sh_fd, sh_px, sh_ty, sh_w, _total = _key_layout(T)
    k64 = keys.astype(np.int64)
    n_pad = T - len(d.chain_info)
    decoded = {
        "exactness": k64 & ((1 << sh_ea) - 1),
        "position": (k64 >> sh_ps) & ((1 << (sh_fd - sh_ps)) - 1),
        "fid": (k64 >> sh_fd) & ((1 << (sh_px - sh_fd)) - 1),
        "proximity": (k64 >> sh_px) & ((1 << (sh_ty - sh_px)) - 1),
        "typo": (k64 >> sh_ty) & ((1 << (sh_w - sh_ty)) - 1),
        "words": (k64 >> sh_w) - n_pad,
    }
    ea = (k64 >> sh_ea) & 3

    search = d.search
    rules = search._assembled_rules(for_query=True)
    graph_dims = [r[1] for r in rules if r[0] == "graph"]
    cost = np.stack([decoded[dim] for dim in graph_dims])
    # words level: matched leading term ids (score_delta level decode)
    levels = np.clip(
        len(d.chain_info) - decoded["words"], 0, len(d.chain_info)
    ).astype(np.int64)
    shim = _ShimScorer(store, d, cand_mask)
    return search._compute_global_scores(rules, cost, levels, ea, ranked, shim)


def _finish_device_result(
    store: IndexStore,
    d: ChainDescriptor,
    ranked: np.ndarray,
    total: int,
    n_exact: int,
    mask_row,
    delta_matches=None,
    keys=None,
    T: int = MAX_T,
) -> Optional[SearchResult]:
    """Build a SearchResult from the exact ranked candidate list, applying
    pagination + distinct through the host's _paginate (ONE place owns
    those semantics). Returns None when this query must fall back to the
    host scorer (sort ambiguity / distinct beyond TOPK)."""
    search = d.search
    max_hits = search.max_total_hits
    if max_hits is None:
        max_hits = store.settings.pagination.max_total_hits

    live = ranked >= 0
    ranked = ranked[live]
    if keys is not None:
        keys = keys[live]
    needed = min(search.offset + search.limit, total, max_hits)
    if n_exact < min(needed, len(ranked)):
        return None  # sort quantization could not prove the page exact
    if d.distinct_field is not None:
        # the first-per-value rule needs the FULL candidate list to be
        # exact (both for the page and for the adjusted total)
        if total > len(ranked) or n_exact < len(ranked):
            return None

    mask = None
    if mask_row is not None:
        mask = unpack_bitmap(mask_row, len(mask_row) * 32)
        if delta_matches is not None and len(delta_matches):
            # the kernel's bitmap covers base docids only; the host
            # overlay's matches complete the candidate set
            mask[delta_matches] = True

    scores_by_docid = None
    if search.compute_scores:
        if keys is None or mask is None:
            return None  # scores need the key column + candidate bitmap
        scores_by_docid = _device_scores(store, d, T, ranked, keys, mask)

    res = search._paginate(
        ranked.astype(np.int64), ranked.astype(np.int64), scores_by_docid
    )
    if d.distinct_field is None:
        res.total_hits = int(min(total, max_hits))
    res.query_terms = d.located_terms
    if mask is not None:
        res.candidates_mask = mask
    return res


def execute_device_batch(
    store: IndexStore, descriptors: list[ChainDescriptor], T: int = MAX_T
) -> list[Optional[SearchResult]]:
    """One device execute for a batch of descriptors. B is padded to
    MAX_BATCH and T to the ladder width with match-nothing descriptors:
    one compiled scoring program per (corpus bucket D, ladder T). Entries
    come back None when that query must re-run on the host scorer."""
    from ..ops.arena_scorer import (
        merge_topk_host,
        merge_topk_sort_host,
        planes_chain_topk,
    )

    D = _plane_docs(store)
    arena = get_arena(store, D)
    n_real = len(descriptors)
    real = descriptors
    B = _ladder_B(n_real)
    descriptors = [_pad_descriptor(d, T) for d in descriptors]
    descriptors = descriptors + [
        _empty_descriptor(T, descriptors[0].search)
        for _ in range(B - n_real)
    ]

    # filter universes ride as a packed (B, D/32) input, not as pool rows
    # (per-batch transient rows were a recompile source). The stack is
    # assembled device-side: padding / match-nothing rows (empty
    # universe_ids) are the zeros base, so only real filters upload.
    use_valid = np.zeros(B, dtype=bool)
    filt = []
    for i, d in enumerate(descriptors):
        if d.universe_ids is not None:
            use_valid[i] = True
            if len(d.universe_ids):
                filt.append((
                    i,
                    d.universe_packed
                    if d.universe_packed is not None
                    else pack_bitmap(d.universe_ids, D),
                ))
    universe = _assemble_universe(store, D, B, filt)

    import time as _time

    from ..ops.arena_scorer import MASK_SLOTS

    # facet/distinct bitmaps ride back through the program's fixed
    # MASK_SLOTS output rows (one small transfer); drains with more mask
    # queries than slots fall back to reading the whole candw
    want = [i for i in range(n_real) if descriptors[i].want_mask]
    mask_sel = np.zeros(MASK_SLOTS, np.int32)
    for slot, i in enumerate(want[:MASK_SLOTS]):
        mask_sel[slot] = i

    trace = os.environ.get("MEILI_TPU_DEVICE_TRACE") == "1"
    t_kernel = _time.perf_counter()
    try:
        byte_pool = arena.prepare_batch()
        t_prep = _time.perf_counter()
        out, candw, masks = planes_chain_topk(
            byte_pool,
            np.stack([d.term_rows for d in descriptors]),
            np.stack([d.pair_rows for d in descriptors]),
            np.stack([d.ea_rows for d in descriptors]),
            np.array([d.sort_row for d in descriptors], np.int32),
            np.array([bool(d.sort_criteria) for d in descriptors], bool),
            universe,
            use_valid,
            np.stack([d.adj for d in descriptors]),
            np.stack([d.mand for d in descriptors]),
            _live_mask(store, D),
            T=T,
            D=D,
            k=TOPK,
            mask_sel=mask_sel,
        )
    except Exception:
        # a failed append may have donated a pool away — drop the arena so
        # the next batch rebuilds from the host caches
        store._device_arena = None
        raise

    # the dispatch above is async; THIS readback blocks for the whole
    # remote execute (latency ~27 ms + ~25-70 MB/s readback, so the main
    # output stays small and the (B, D/32) candidate bitmaps stay on
    # device). The store lock is NOT needed while the device runs — the
    # pool is an immutable jax value already captured by the in-flight
    # computation — so release it and let a second executor prepare the
    # next drain in parallel. Formatting after re-acquire tolerates
    # concurrent deletes (documents.get).
    lock = store._lock
    released = False
    if lock._is_owned():
        lock.release()
        if lock._is_owned():
            # a re-entrant caller held the RLock at depth > 1: one release
            # did not actually free it, so restore the depth and keep it
            # held for the readback (no overlap, but correct)
            lock.acquire()
        else:
            released = True
    try:
        out = np.asarray(out)
        mask_rows: dict[int, np.ndarray] = {}
        if want:
            # ONE readback per drain: the program's MASK_SLOTS output when
            # the wanted rows fit, else the whole (B, D/32) bitmap.
            # Per-row np.asarray calls each pay the ~27 ms tunnel round
            # trip (measured 1.7 s for a 32-facet-query drain)
            if len(want) <= MASK_SLOTS:
                rows = np.asarray(masks)
                for slot, i in enumerate(want):
                    mask_rows[i] = rows[slot]
            else:
                rows = np.asarray(candw)
                for i in want:
                    mask_rows[i] = rows[i]
    finally:
        if released:
            lock.acquire()
    t_read = _time.perf_counter()
    k = TOPK
    idx1, key1 = out[:, :k], out[:, k : 2 * k]
    idx2, key2 = out[:, 2 * k : 3 * k], out[:, 3 * k : 4 * k]
    counts = out[:, 4 * k]
    # the approx (PartialReduce) selection validates its own exactness
    # per query; a 0 means that query's candidate lists may be missing a
    # below-kth doc — re-run it on the host scorer (ops/approx_select.py)
    exact = out[:, 4 * k + 1] if out.shape[1] > 4 * k + 1 else None

    delta_live = (
        _delta_ids_array(store) if store.delta_docids else EMPTY
    )
    results: list[Optional[SearchResult]] = []
    for i in range(n_real):
        d = real[i]
        # tri-state exactness from the approx selection (0 = nothing
        # proven -> host re-run; 1 = strictly-below-kth prefix proven ->
        # serve pages inside it, merge with tie_proven=False; 2 = fully
        # proven). topk2/sort selections always emit 2.
        ex = int(exact[i]) if exact is not None else 2
        if ex == 0:
            _stats_add(inexact_flags=1)
            results.append(None)
            continue
        if ex == 1:
            _stats_add(inexact_flags=1)
        count = int(counts[i])
        d_ids, d_keys = EMPTY, None
        if len(delta_live):
            d_ids, d_keys = score_delta(store, d, delta_live, T)
        want_keys = bool(d.search.compute_scores)
        rkeys = None
        if d.sort_criteria:
            search = d.search

            def sort_key_rows(cand, search=search, d=d):
                rows: list[np.ndarray] = []
                for f, asc in d.sort_criteria:
                    rows.extend(search._sort_field_rows(f, asc, cand))
                return rows

            f0, asc0 = d.sort_criteria[0]
            plane = _sort_plane_host(store, f0, asc0)

            def qsort_of(cand, plane=plane):
                return plane[cand].astype(np.int32) + 128

            got = merge_topk_sort_host(
                idx1[i], key1[i], idx2[i], key2[i], count, TOPK, T,
                sort_key_rows, qsort_of,
                delta_ids=d_ids, delta_keys=d_keys,
                tie_proven=(ex == 2), return_keys=want_keys,
            )
        else:
            got = merge_topk_host(
                idx1[i], key1[i], idx2[i], key2[i], count, TOPK,
                delta_ids=d_ids, delta_keys=d_keys,
                tie_proven=(ex == 2), return_keys=want_keys,
            )
        if want_keys:
            ranked, n_exact, total, rkeys = got
        else:
            ranked, n_exact, total = got
        results.append(
            _finish_device_result(
                store, d, ranked, total, n_exact, mask_rows.get(i),
                delta_matches=d_ids, keys=rkeys, T=T,
            )
        )
    if trace:
        import sys as _sys

        print(
            f"device batch B={n_real} T={T} D={D}:"
            f" prep {t_prep - t_kernel:.3f}s"
            f" dispatch+read {t_read - t_prep:.3f}s"
            f" finish {_time.perf_counter() - t_read:.3f}s"
            f" [{_time.monotonic():.2f}]",
            file=_sys.stderr,
            flush=True,
        )
    return results


_BACKEND_OK: Optional[bool] = None


def _backend_available() -> bool:
    """Whether a jax backend can actually initialize (checked once). A
    missing/broken backend must degrade to the host path, never 500 — a
    subprocess can inherit a JAX_PLATFORMS naming a plugin it can't load."""
    global _BACKEND_OK
    if _BACKEND_OK is None:
        from ..ops.backend_probe import backend_kind

        # fail-fast probe: a dead accelerator transport hangs jax's
        # backend init forever — that must degrade to the host path,
        # never wedge or stall the serving process. While the probe is
        # pending (None) route to the host WITHOUT caching.
        kind = backend_kind()
        if kind is None:
            return False
        _BACKEND_OK = kind != ""
    return _BACKEND_OK


def device_batch_enabled() -> bool:
    """The plane-resident path. Default ON when a device is present;
    MEILI_TPU_DEVICE_BATCH=0 disables."""
    import os

    flag = os.environ.get("MEILI_TPU_DEVICE_BATCH")
    if flag is not None and flag != "1":
        return False
    if flag == "1" and os.environ.get("MEILI_TPU_DEVICE_STRICT") == "1":
        return True  # tests: fail loudly instead of silently using the host
    return _backend_available()


_WARM_STATE: dict = {}  # (D, T, k) -> "pending" | "ready"
_WARM_LOCK = None


def _warm_key(D: int):
    return (D, T_LADDER, B_LADDER, TOPK)


def warm_kernels(store: IndexStore, wait: bool = False) -> bool:
    """Compile the scoring + append kernels for this store's corpus-size
    bucket, OFF the serving path (a cold XLA compile costs 30-290 s over
    the tunnel — it must never land inside a search request). Returns True
    when the bucket's programs are ready. Trigger points: index build
    completion and the first routing decision; with the persistent compile
    cache this is seconds on any later process."""
    import threading

    global _WARM_LOCK
    if _WARM_LOCK is None:
        _WARM_LOCK = threading.Lock()
    D = _plane_docs(store)
    if D > MAX_PLANE_DOCS:
        return False
    from ..ops.backend_probe import backend_kind

    # warm-up may wait out the backend init (it runs on daemon threads /
    # the bench's explicit warm phase, never a serving request)
    kind = backend_kind(wait_s=90.0)
    if kind in (None, ""):
        return False  # "" = backend init hung (dead transport)
    if kind == "cpu" and os.environ.get("MEILI_TPU_DEVICE_STRICT") != "1":
        # CPU is the host path's job; compiling the batch kernels there
        # wastes cycles. STRICT mode (tests) compiles them anyway so the
        # boot-warm contract is CI-checkable without a TPU.
        return False
    key = _warm_key(D)
    with _WARM_LOCK:
        state = _WARM_STATE.get(key)
        if state is None:
            _WARM_STATE[key] = "pending"

    def compile_now():
        try:
            from ..index.device_arena import APPEND_ROWS, byte_capacity
            from ..ops.arena_scorer import append_rows, planes_chain_topk

            import jax.numpy as jnp

            D32 = D // 32
            nc = byte_capacity(D)
            byte_pool = jnp.full((nc, D // 4), -1, jnp.int32)
            z = np.zeros
            byte_pool = append_rows(
                byte_pool,
                np.full((APPEND_ROWS, D // 4), -1, np.int32),
                np.int32(1),
            )
            for T in T_LADDER:
                tp = max(T - 1, 1)
                for B in B_LADDER:
                    out, _candw, _masks = planes_chain_topk(
                        byte_pool,
                        z((B, T, 3), np.int32),
                        z((B, tp, 3), np.int32),
                        z((B, T + 1), np.int32),
                        z(B, np.int32),
                        z(B, bool),
                        z((B, D32), np.int32),
                        z(B, bool),
                        z((B, tp), bool),
                        z((B, T), bool),
                        jnp.zeros(D32, jnp.int32),
                        T=T,
                        D=D,
                        k=TOPK,
                    )
                    np.asarray(out)
            _WARM_STATE[key] = "ready"
        except Exception:
            _WARM_STATE.pop(key, None)  # retry on the next trigger

    if state is None:
        if wait:
            compile_now()
        else:
            threading.Thread(
                target=compile_now, name=f"kernel-warm-{D}", daemon=True
            ).start()
    elif wait:
        import time as _t

        # a tunneled cold compile has measured up to ~900 s; a shorter
        # cap here once made the bench run host-only because an async
        # warm (kicked at ingest completion) held "pending" past it
        deadline = _t.monotonic() + 1800
        while _WARM_STATE.get(key) == "pending" and _t.monotonic() < deadline:
            _t.sleep(0.5)
    return _WARM_STATE.get(key) == "ready"


def _device_worthwhile(
    store: IndexStore, n_eligible: int, force_device: bool = False
) -> bool:
    """Adaptive routing: the device batch pays a fixed dispatch+readback,
    so it wins when the host cost exceeds that — large corpora (the host
    numpy path degrades linearly with candidates) or real concurrency
    (B queries amortize one execute). A lone query on a small corpus is
    faster on the host (measured: ~5 ms host vs ~60 ms device at 100k).
    The bucket's kernels must already be compiled: a cold compile on the
    serving path would stall every queued request for minutes (warm-up is
    async, kicked here and at index build). MEILI_TPU_DEVICE_STRICT=1
    forces the device path (tests)."""
    if os.environ.get("MEILI_TPU_DEVICE_STRICT") == "1":
        return True
    min_batch = int(os.environ.get("MEILI_TPU_DEVICE_MIN_BATCH", "4"))
    # a lone query is ALWAYS cheaper on the host — even at 1M docs the
    # batch kernel runs its full padded batch while the host answers one
    # query in ~60 ms. The device engages on real batches (the queue
    # builds naturally once host latency grows — Little's law) or on the
    # batcher's measured-probe signal.
    if not force_device and n_eligible < min_batch:
        return False
    return warm_kernels(store, wait=False)


# conservative per-descriptor staged-row bound (cold, nothing cached):
# T*3 term planes + tp*3 pair planes + T+1 ea planes + 1 sort plane
_MAX_BYTE_ROWS_PER_QUERY = MAX_T * 3 + (MAX_T - 1) * 3 + MAX_T + 1 + 1


_exec_stats = _threading.local()

# serving attribution counters (round 5, VERDICT r4 weak #3: the bench
# artifact must be able to attribute its own regressions). Cumulative
# per process; bench.py snapshots them into the JSON.
_SERVING_STATS_LOCK = _threading.Lock()
_SERVING_STATS = {
    "drains": 0,  # device drains executed
    "device_served": 0,  # queries answered from a device result
    "host_fallbacks": 0,  # device ran but page unproven -> host re-run
    "inexact_flags": 0,  # queries the selection pass flagged inexact
    "device_errors": 0,  # drains that raised -> whole chunk host re-run
    # drain wall-time attribution (round 5: the 48-vs-127 QPS HTTP gap
    # had to be reverse-engineered from source; these make the artifact
    # self-explaining). device_exec_s is time inside execute_device_batch;
    # drain_wall_s is the batcher's whole-drain wall (exec + host finish
    # + response fan-out); host_mode_served counts queries the batcher
    # answered in HOST mode (the A/B controller's measurement ramp).
    "device_exec_s": 0.0,
    "drain_wall_s": 0.0,
    "host_mode_served": 0,
    "host_mode_drains": 0,
}


def _stats_add(**kv) -> None:
    with _SERVING_STATS_LOCK:
        for k, v in kv.items():
            _SERVING_STATS[k] += v


def serving_stats(reset: bool = False) -> dict:
    """Snapshot (optionally reset) the device/host serving attribution
    counters. `exact_flag_rate` = inexact_flags / (device_served +
    host_fallbacks) when any device query ran."""
    with _SERVING_STATS_LOCK:
        snap = dict(_SERVING_STATS)
        if reset:
            for k in _SERVING_STATS:
                _SERVING_STATS[k] = 0
    ran = snap["device_served"] + snap["host_fallbacks"]
    snap["exact_flag_rate"] = (
        round(snap["inexact_flags"] / ran, 4) if ran else 0.0
    )
    snap["device_exec_s"] = round(snap["device_exec_s"], 3)
    snap["drain_wall_s"] = round(snap["drain_wall_s"], 3)
    return snap


def consume_device_exec_s() -> float:
    """Return the device-execute wall time recorded on this thread since
    the last call, and reset it. 0.0 means no device execute ran (pure
    host serving or a fallback) — callers use this to keep device-drain
    timing statistics honest (engine/batcher.py EWMA)."""
    s = getattr(_exec_stats, "s", 0.0)
    _exec_stats.s = 0.0
    return s


def search_many(
    store: IndexStore,
    searches: list[Search],
    force_device: bool = False,
) -> list[SearchResult]:
    """Execute a batch: chain-compatible queries in grouped device executes,
    the rest on the host scorer. Order-preserving."""
    results: list[Optional[SearchResult]] = [None] * len(searches)

    def run_chunk(chunk: list[tuple[int, ChainDescriptor]], T: int) -> None:
        if not chunk:
            return
        try:
            t0 = _time.monotonic()
            batch_results = execute_device_batch(
                store, [d for _i, d in chunk], T
            )
            # record device wall time for this thread's caller: the
            # batcher's drain-duration EWMA must only see drains where a
            # device execute actually ran (a 32-query HOST fallback at 1M
            # docs takes seconds and would poison the hold heuristic)
            dt_exec = _time.monotonic() - t0
            _exec_stats.s = getattr(_exec_stats, "s", 0.0) + dt_exec
            _stats_add(device_exec_s=dt_exec)
        except Exception:
            if os.environ.get("MEILI_TPU_DEVICE_STRICT") == "1":
                raise  # tests: a silent host fallback would hide bugs
            _stats_add(device_errors=1)
            for i, _d in chunk:
                results[i] = searches[i].execute()
            return
        n_fell = sum(1 for r in batch_results if r is None)
        _stats_add(
            drains=1,
            device_served=len(batch_results) - n_fell,
            host_fallbacks=n_fell,
        )
        for (i, _d), res in zip(chunk, batch_results):
            # res is None when the device could not prove the page exact
            # (sort quantization / distinct beyond TOPK): host re-run
            results[i] = res if res is not None else searches[i].execute()

    if device_batch_enabled():
        eligible = [
            (i, s)
            for i, s in enumerate(searches)
            if _plane_docs(s.store) <= MAX_PLANE_DOCS
        ]
        if eligible and _device_worthwhile(store, len(eligible), force_device):
            arena = get_arena(store, _plane_docs(store))
            # ONE execute per drain at the widest ladder the drain needs:
            # short-only drains ride the cheap T=3 program, and a single
            # long query widens the whole drain instead of paying a
            # second sequential execute
            pending: list[tuple[int, ChainDescriptor]] = []

            def flush():
                nonlocal pending
                if pending:
                    lt = _ladder_T(max(d.T for _i, d in pending))
                    run_chunk(pending, lt)
                    pending = []

            for i, s in eligible:
                if not arena.has_room(_MAX_BYTE_ROWS_PER_QUERY):
                    # pool full: execute what we have (its row indices are
                    # still live), then flush and let rows re-register
                    flush()
                    arena.reset_rows()
                try:
                    d = build_descriptor(s)
                except Exception:
                    d = None
                if d is not None:
                    pending.append((i, d))
                    if len(pending) == MAX_BATCH:
                        flush()
            flush()
    for i, s in enumerate(searches):
        if results[i] is None:
            results[i] = s.execute()
    return results
