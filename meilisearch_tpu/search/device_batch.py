"""Batched device execution of chain queries.

The serving-side half of ops/batch_scorer.py: each eligible Search is
compiled to a compact posting-ID descriptor on the host (no dense masks),
descriptors are grouped by padded shape, and each group runs as ONE device
execute — amortizing the fixed dispatch round trip across the batch
(SURVEY §2.6 "batched query execution"; replaces the reference's
one-core-per-search model, search_queue.rs:31).

Eligibility mirrors FusedScorer.device_compatible: default ranking rules,
`last` strategy, 1-gram chain, no sort/distinct/score computation. Anything
else falls back to the host scorer, per query.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..index.arrays import EMPTY, docids_array, to_array, union_many
from ..index.store import IndexStore
from .executor import Search, SearchResult, exact_attribute_rank_ids
from .graph import QueryGraph
from .query_terms import DerivationContext, located_query_terms_from_tokens
from .scorer import Resolver, position_cost_from_distance

MAX_T = 8
MAX_IDS = 16_000_000  # per-descriptor posting-id budget
TOPK = 1024

DEFAULT_RULES = [
    ("graph", "words"),
    ("graph", "typo"),
    ("graph", "proximity"),
    ("graph", "fid"),
    ("graph", "position"),
    ("exact_attribute",),
    ("graph", "exactness"),
]


@dataclass
class ChainDescriptor:
    T: int
    class_pairs: list  # (flat_plane_index_base, ids) for class masks
    pair_entries: list  # (base, ids, value)
    adj: np.ndarray  # (T-1 or 1,) bool
    fid_entries: list  # (base, ids, value)
    pos_entries: list
    exact_pairs: list  # (base, ids)
    ea_entries: list  # (base, ids, value 0/1)
    valid: Optional[np.ndarray]  # universe ids or None (= live)
    located_terms: list
    search: Search


def _subset_words(resolver: Resolver, term, cls: int) -> list[str]:
    return [w for w, _ in resolver.class_words(term, cls)]


def _prefix_words(resolver: Resolver, term, cls: int) -> list[str]:
    if cls == 0 and term.use_prefix_db is not None:
        return resolver.prefix_words(term.use_prefix_db)
    return []


def build_descriptor(search: Search) -> Optional[ChainDescriptor]:
    store = search.store
    settings = store.settings
    if (
        search.sort_criteria
        or search.distinct
        or settings.distinct_attribute
        or search.compute_scores
        or search.compute_score_details
        or search.attributes_to_search_on is not None
        or search.terms_matching_strategy != "last"
        or not (search.query and search.query.strip())
        or search.offset + search.limit > TOPK
    ):
        return None
    if search._assembled_rules(for_query=True) != DEFAULT_RULES:
        return None
    if getattr(store, "dynamic_rules", None) and store.dynamic_rules.rules:
        return None

    ctx = DerivationContext(store, settings)
    tokenizer = store.make_tokenizer(search.locales)
    extracted = located_query_terms_from_tokens(ctx, tokenizer, search.query)
    terms = list(extracted.query_terms)
    if not terms:
        return None

    resolver = Resolver(store, EMPTY, None)
    universe = None
    if (
        search.filter_docids is not None
        or extracted.negative_words
        or extracted.negative_phrases
    ):
        from ..index.arrays import difference, intersect

        universe = docids_array(store)
        if search.filter_docids is not None:
            universe = intersect(universe, to_array(search.filter_docids))
        for w in extracted.negative_words:
            universe = difference(
                universe, resolver.word_docids(w, original=True)
            )
        for p in extracted.negative_phrases:
            universe = difference(universe, resolver.phrase_docids(p))

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
        if term.phrase is not None:
            return None
        chain.append(node)
    chain.sort(key=lambda nd: nd.located.start_term_id)
    T = len(chain)
    if T == 0 or T > MAX_T:
        return None

    D = _plane_docs(store)
    total_ids = 0
    class_pairs = []
    fid_entries = []
    pos_entries = []
    exact_pairs = []
    pair_entries = []
    weight_map = store.fid_weight_map()

    # heavy unions are cached per store generation, keyed by the term's
    # identity (original + prefix flag determines its derivations)
    gcache = resolver.arrays.cache

    for t, node in enumerate(chain):
        term = node.located.term
        start_pos = node.located.start_position
        tkey = (term.original, term.is_prefix, term.use_prefix_db)
        for cls in range(term.max_typo_cost() + 1):
            ids = gcache.get(("dcls", tkey, cls))
            if ids is None:
                ids = resolver.term_class_docids(term, cls)
                gcache[("dcls", tkey, cls)] = ids
            if len(ids):
                base = (t * 3 + cls) * D
                class_pairs.append((base, ids))
                total_ids += len(ids)
            entry = gcache.get(("dfidpos", tkey, cls))
            if entry is None:
                words = _subset_words(resolver, term, cls)
                pwords = _prefix_words(resolver, term, cls)
                all_w = words + pwords
                # fid plane: min weight over fields containing the term
                fid_list = []
                fids: set[int] = set()
                for w in all_w:
                    fids |= resolver.fids_by_word.get(w, set())
                for fid in fids:
                    weight = weight_map.get(fid)
                    if weight is None:
                        continue
                    arr = union_many(
                        [resolver.word_fid_docids(w, fid) for w in all_w]
                    )
                    if len(arr):
                        fid_list.append((arr, weight))
                # position plane: cost_from_distance per bucket
                pos_list = []
                buckets: set[int] = set()
                for w in all_w:
                    buckets |= resolver.buckets_by_word.get(w, set())
                for b in buckets:
                    arr = union_many(
                        [resolver.word_position_docids(w, b) for w in all_w]
                    )
                    if len(arr):
                        pos_list.append((arr, b))
                entry = (fid_list, pos_list)
                gcache[("dfidpos", tkey, cls)] = entry
            for arr, weight in entry[0]:
                fid_entries.append(((t * 3 + cls) * D, arr, weight))
                total_ids += len(arr)
            for arr, b in entry[1]:
                cost = position_cost_from_distance(abs(b - start_pos))
                pos_entries.append(((t * 3 + cls) * D, arr, cost))
                total_ids += len(arr)
        if term.exact is not None:
            ids = resolver.word_docids(term.exact, original=True)
            if len(ids):
                exact_pairs.append((t * D, ids))
                total_ids += len(ids)

    adj = np.zeros(max(T - 1, 1), dtype=bool)
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
            rterm.original,
            rterm.is_prefix,
            rterm.use_prefix_db,
        )
        for pc in range(lterm.max_typo_cost() + 1):
            lwords = _subset_words(resolver, lterm, pc)
            for c in range(rterm.max_typo_cost() + 1):
                rwords = _subset_words(resolver, rterm, c)
                rprefix = _prefix_words(resolver, rterm, c)
                base = ((t - 1) * 9 + pc * 3 + c) * D
                for rel in (0, 1, 2):
                    arr = gcache.get(("dpair", pkey, pc, c, rel))
                    if arr is None:
                        fwd, bwd = rel + 1, rel
                        parts = []
                        if rprefix:
                            for lw in lwords:
                                parts.extend(
                                    resolver.pair_proximity_docids(fwd, lw, w)
                                    for w in rprefix
                                )
                                if bwd >= 1:
                                    parts.append(
                                        resolver.pair_proximity_docids(
                                            bwd, rterm.use_prefix_db, lw
                                        )
                                    )
                        for lw in lwords:
                            for rw in rwords:
                                parts.append(
                                    resolver.pair_proximity_docids(fwd, lw, rw)
                                )
                                if bwd >= 1:
                                    parts.append(
                                        resolver.pair_proximity_docids(
                                            bwd, rw, lw
                                        )
                                    )
                        arr = union_many(parts)
                        gcache[("dpair", pkey, pc, c, rel)] = arr
                    if len(arr):
                        pair_entries.append((base, arr, rel))
                        total_ids += len(arr)

    # ExactAttribute rank ids per words level (device gathers by level)
    ea_entries = []
    uni = universe if universe is not None else docids_array(store)
    ea_key_base = tuple(n.located.term.original for n in chain)
    for k in range(1, T + 1):
        ranks = None
        if universe is None:
            ranks = gcache.get(("dea", ea_key_base, k))
        if ranks is None:
            ranks = exact_attribute_rank_ids(store, graph, k, uni, resolver)
            if universe is None:
                gcache[("dea", ea_key_base, k)] = ranks
        rank0, rank1 = ranks
        if len(rank0):
            ea_entries.append((k * D, rank0, 0))
            total_ids += len(rank0)
        if len(rank1):
            ea_entries.append((k * D, rank1, 1))
            total_ids += len(rank1)

    if universe is not None:
        total_ids += len(universe)
    if total_ids > MAX_IDS:
        return None

    return ChainDescriptor(
        T=T,
        class_pairs=class_pairs,
        pair_entries=pair_entries,
        adj=adj,
        fid_entries=fid_entries,
        pos_entries=pos_entries,
        exact_pairs=exact_pairs,
        ea_entries=ea_entries,
        valid=universe,
        located_terms=[n.located for n in graph.term_nodes()],
        search=search,
    )


# -- batch assembly -------------------------------------------------------------


def _plane_docs(store: IndexStore) -> int:
    d = max(store._next_docid, 1)
    return 1 << (d - 1).bit_length() if d > 1024 else 1024


def _flatten(pairs, D, dump, with_val, val_dtype=np.int16):
    ids = [np.asarray(base + arr, dtype=np.int64) for base, arr, *rest in pairs]
    idx = (
        np.concatenate(ids).astype(np.int32)
        if ids
        else np.empty(0, dtype=np.int32)
    )
    if not with_val:
        return idx, None
    vals = (
        np.concatenate(
            [
                np.full(len(arr), rest[0], dtype=val_dtype)
                for _base, arr, *rest in pairs
            ]
        )
        if pairs
        else np.empty(0, dtype=val_dtype)
    )
    return idx, vals


def _pad_to(arr, length, fill, unique: bool = False):
    if len(arr) >= length:
        return arr
    out = np.empty(length, dtype=arr.dtype)
    out[: len(arr)] = arr
    if unique:
        # consecutive dump-region indices: collision-free padded scatters
        out[len(arr):] = fill + np.arange(length - len(arr), dtype=arr.dtype)
    else:
        out[len(arr):] = fill
    return out


def _live_mask(store: IndexStore, D: int):
    # cached as a store attribute: a global dict keyed by id(store) serves
    # stale masks when a freed store's id is reused by a new one
    import jax.numpy as jnp

    cached = getattr(store, "_device_live_cache", None)
    if cached is not None and cached[0] == (store.generation, D):
        return cached[1]
    live = np.zeros(D, dtype=bool)
    live[docids_array(store)] = True
    dev = jnp.asarray(live)
    store._device_live_cache = ((store.generation, D), dev)
    return dev


MAX_BATCH = 8


def _empty_descriptor(T: int, search: Search) -> ChainDescriptor:
    """Batch-padding descriptor: matches nothing (empty universe)."""
    return ChainDescriptor(
        T=T,
        class_pairs=[],
        pair_entries=[],
        adj=np.zeros(max(T - 1, 1), dtype=bool),
        fid_entries=[],
        pos_entries=[],
        exact_pairs=[],
        ea_entries=[],
        valid=EMPTY,
        located_terms=[],
        search=search,
    )


def execute_device_batch(
    store: IndexStore, descriptors: list[ChainDescriptor]
) -> list[SearchResult]:
    """One device execute for a group of same-T descriptors. B is padded to
    a {1,2,4,8} ladder with match-nothing descriptors so batch size never
    forces a recompile."""
    from ..ops.batch_scorer import batched_chain_topk, bucket

    D = _plane_docs(store)
    T = descriptors[0].T
    n_real = len(descriptors)
    b = 1
    while b < n_real:
        b *= 2
    descriptors = descriptors + [
        _empty_descriptor(T, descriptors[0].search)
        for _ in range(b - n_real)
    ]
    B = len(descriptors)

    rows = {name: [] for name in (
        "ci", "pi", "pv", "fi", "fv", "oi", "ov", "ei", "ai", "av", "vi"
    )}
    adj_rows = []
    use_valid = []
    for d in descriptors:
        ci, _ = _flatten(d.class_pairs, D, None, False)
        pi, pv = _flatten(d.pair_entries, D, None, True, np.int8)
        fi, fv = _flatten(d.fid_entries, D, None, True, np.int16)
        oi, ov = _flatten(d.pos_entries, D, None, True, np.int16)
        ei, _ = _flatten(d.exact_pairs, D, None, False)
        ai, av = _flatten(d.ea_entries, D, None, True, np.int8)
        vi = (
            d.valid.astype(np.int32)
            if d.valid is not None
            else np.empty(0, dtype=np.int32)
        )
        use_valid.append(d.valid is not None)
        adj_rows.append(d.adj)
        for name, val in (
            ("ci", ci), ("pi", pi), ("pv", pv), ("fi", fi), ("fv", fv),
            ("oi", oi), ("ov", ov), ("ei", ei), ("ai", ai), ("av", av),
            ("vi", vi),
        ):
            rows[name].append(val)

    dumps = {
        "ci": T * 3 * D, "pi": max(T - 1, 1) * 9 * D, "fi": T * 3 * D,
        "oi": T * 3 * D, "ei": T * D, "ai": (T + 1) * D, "vi": D,
    }
    stacked = {}
    for name in ("ci", "pi", "fi", "oi", "ei", "ai", "vi"):
        L = bucket(max(len(r) for r in rows[name]) or 1)
        stacked[name] = np.stack(
            [_pad_to(r, L, dumps[name], unique=True) for r in rows[name]]
        )
    for name, fill in (("pv", 3), ("fv", 0), ("ov", 0), ("av", 2)):
        idx_name = {"pv": "pi", "fv": "fi", "ov": "oi", "av": "ai"}[name]
        L = stacked[idx_name].shape[1]
        stacked[name] = np.stack([_pad_to(r, L, fill) for r in rows[name]])

    live = _live_mask(store, D)
    top, counts = batched_chain_topk(
        stacked["ci"],
        stacked["pi"], stacked["pv"],
        np.stack(adj_rows),
        stacked["fi"], stacked["fv"],
        stacked["oi"], stacked["ov"],
        stacked["ei"],
        stacked["ai"], stacked["av"],
        stacked["vi"],
        np.asarray(use_valid),
        live,
        T=T, D=D, k=TOPK,
    )
    top = np.asarray(top)
    counts = np.asarray(counts)

    results = []
    for i, d in enumerate(descriptors[:n_real]):
        search = d.search
        max_hits = search.max_total_hits
        if max_hits is None:
            max_hits = store.settings.pagination.max_total_hits
        ranked = top[i][top[i] >= 0]
        ranked = ranked[:max_hits]
        page = ranked[search.offset : search.offset + search.limit].tolist()
        res = SearchResult(
            documents_ids=[int(x) for x in page],
            candidates=ranked.astype(np.int64),
            query_terms=d.located_terms,
        )
        res.total_hits = int(min(int(counts[i]), max_hits))
        results.append(res)
    return results


def device_batch_enabled() -> bool:
    """Opt-in (MEILI_TPU_DEVICE_BATCH=1).

    Status after measurement on the tunneled v5e (100k-doc corpus, warm
    compile cache + warm descriptor caches): ~16 QPS batched vs ~148 QPS on
    the host scorer. The batch design does amortize the fixed ~28 ms
    dispatch round trip, but the kernel ranks over the FULL doc axis
    (O(T*3*D) plane traffic per query) while the host path is sparse in the
    matched candidates. The round-2 fix is device-side compaction: scatter
    matched ids, compact them with one sort, and run the DP over the
    compacted axis — same kernel shape, candidate-sparse cost. Until then
    the host path stays the default and this path is pinned correct by
    tests/test_device_batch.py."""
    import os

    return os.environ.get("MEILI_TPU_DEVICE_BATCH", "0") == "1"


def search_many(store: IndexStore, searches: list[Search]) -> list[SearchResult]:
    """Execute a batch: chain-compatible queries in grouped device executes,
    the rest on the host scorer. Order-preserving."""
    results: list[Optional[SearchResult]] = [None] * len(searches)
    groups: dict[int, list[tuple[int, ChainDescriptor]]] = {}
    if device_batch_enabled():
        for i, s in enumerate(searches):
            try:
                d = build_descriptor(s)
            except Exception:
                d = None
            if d is not None:
                groups.setdefault(d.T, []).append((i, d))
    for T, items in groups.items():
        for start in range(0, len(items), MAX_BATCH):
            chunk = items[start : start + MAX_BATCH]
            try:
                batch_results = execute_device_batch(
                    store, [d for _i, d in chunk]
                )
            except Exception:
                for i, _d in chunk:
                    results[i] = searches[i].execute()
                continue
            for (i, _d), res in zip(chunk, batch_results):
                results[i] = res
    for i, s in enumerate(searches):
        if results[i] is None:
            results[i] = s.execute()
    return results
