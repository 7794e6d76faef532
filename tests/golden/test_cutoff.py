"""Port of /root/reference/crates/milli/src/search/new/tests/cutoff.rs.

Pins the reference's MID-FLIGHT degraded-search semantics: which ranking
rules report `Skipped` at a partial budget and how the partial bucket
ordering comes out. The reference drives this with
`Deadline::never().with_stop_after(n)` (lib.rs:203-219) — a fake clock
counting bucket_sort loop iterations; `Search.stop_after` mirrors it
(executor.py:_execute_stop_after).

Expected orderings/scores/details are the reference's inline insta
snapshots, which report INTERNAL docids — documents are inserted with
reversed external ids (4,3,2,1,0), so internal ids are 0..4 in insertion
order, matching this engine's docid assignment exactly.
"""

import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.executor import Search
from meilisearch_tpu.search.filters import evaluate_filter

DOCS = [
    {"id": 4, "text": "hella puppo kefir"},
    {"id": 3, "text": "hella puppy kefir"},
    {"id": 2, "text": "hello"},
    {"id": 1, "text": "hello puppy"},
    {"id": 0, "text": "hello puppy kefir"},
]


def create_index():
    store = IndexStore("cutoff")
    store.settings.apply_json(
        {
            "searchableAttributes": ["text"],
            "filterableAttributes": ["id"],
            "rankingRules": ["words", "typo"],
        }
    )
    store.primary_key = "id"
    store.add_documents(DOCS)
    return store


def run(store, *, stop_after=None, cutoff_ms=None, limit=4, filt=None):
    kwargs = {}
    if filt is not None:
        kwargs["filter_docids"] = evaluate_filter(store, filt)
    s = Search(
        store,
        query="hello puppy kefir",
        limit=limit,
        compute_scores=True,
        compute_score_details=True,
        stop_after=stop_after,
        cutoff_ms=cutoff_ms,
        **kwargs,
    )
    return s.execute()


def details_kinds(res):
    """Per-hit list of rendered detail entries in order — the shape the
    reference snapshots pin ([Words, Typo] / [Words, Skipped] / [Skipped])
    plus the salient numbers."""
    out = []
    for d in res.documents_ids:
        det = res.details_by_docid[d]
        entries = sorted(det.items(), key=lambda kv: kv[1]["order"])
        row = []
        for name, e in entries:
            if name == "words":
                row.append(("words", e["matchingWords"], e["maxMatchingWords"]))
            elif name == "typo":
                row.append(("typo", e["typoCount"], e["maxTypoCount"]))
            else:
                row.append((name,))
        out.append(row)
    return out


def scores4(res):
    return [round(s, 4) for s in res.scores]


def test_basic_degraded_search():
    # cutoff.rs:61 basic_degraded_search
    store = create_index()
    res = run(store, cutoff_ms=0, limit=3)
    assert res.degraded


def test_degraded_search_cannot_skip_filter():
    # cutoff.rs:76: candidates [0, 1], documents [0, 1] (internal ids)
    store = create_index()
    res = run(store, cutoff_ms=0, limit=100, filt="id > 2")
    assert res.degraded
    assert sorted(res.candidates) == [0, 1]
    assert res.documents_ids == [0, 1]


def test_full_run_score_details():
    # cutoff.rs:97 (Deadline::never()): the fully-sorted baseline
    store = create_index()
    res = run(store)
    assert res.documents_ids == [4, 1, 0, 3]
    assert scores4(res) == [1.0, 0.9167, 0.8333, 0.6667]
    assert details_kinds(res) == [
        [("words", 3, 3), ("typo", 0, 3)],
        [("words", 3, 3), ("typo", 1, 3)],
        [("words", 3, 3), ("typo", 2, 3)],
        [("words", 2, 3), ("typo", 0, 2)],
    ]
    assert not res.degraded


@pytest.mark.parametrize(
    "stop_after,ids,scores,kinds",
    [
        # ONE iteration: words' first bucket emitted, typo skipped; the
        # remaining universe unwinds fully Skipped
        (
            1,
            [0, 1, 4, 2],
            [0.6667, 0.6667, 0.6667, 0.0],
            [
                [("words", 3, 3), ("skipped",)],
                [("words", 3, 3), ("skipped",)],
                [("words", 3, 3), ("skipped",)],
                [("skipped",)],
            ],
        ),
        # TWO: the first document is entirely sorted
        (
            2,
            [4, 0, 1, 2],
            [1.0, 0.6667, 0.6667, 0.0],
            [
                [("words", 3, 3), ("typo", 0, 3)],
                [("words", 3, 3), ("skipped",)],
                [("words", 3, 3), ("skipped",)],
                [("skipped",)],
            ],
        ),
        # THREE: the second as well
        (
            3,
            [4, 1, 0, 2],
            [1.0, 0.9167, 0.6667, 0.0],
            [
                [("words", 3, 3), ("typo", 0, 3)],
                [("words", 3, 3), ("typo", 1, 3)],
                [("words", 3, 3), ("skipped",)],
                [("skipped",)],
            ],
        ),
        # FOUR: the third; words has not yet emitted its next bucket
        (
            4,
            [4, 1, 0, 2],
            [1.0, 0.9167, 0.8333, 0.0],
            [
                [("words", 3, 3), ("typo", 0, 3)],
                [("words", 3, 3), ("typo", 1, 3)],
                [("words", 3, 3), ("typo", 2, 3)],
                [("skipped",)],
            ],
        ),
        # FIVE: words' second bucket (2-word matchers) lands, typo skipped
        (
            5,
            [4, 1, 0, 3],
            [1.0, 0.9167, 0.8333, 0.3333],
            [
                [("words", 3, 3), ("typo", 0, 3)],
                [("words", 3, 3), ("typo", 1, 3)],
                [("words", 3, 3), ("typo", 2, 3)],
                [("words", 2, 3), ("skipped",)],
            ],
        ),
        # SIX: finished
        (
            6,
            [4, 1, 0, 3],
            [1.0, 0.9167, 0.8333, 0.6667],
            [
                [("words", 3, 3), ("typo", 0, 3)],
                [("words", 3, 3), ("typo", 1, 3)],
                [("words", 3, 3), ("typo", 2, 3)],
                [("words", 2, 3), ("typo", 0, 2)],
            ],
        ),
    ],
)
def test_degraded_search_and_score_details(stop_after, ids, scores, kinds):
    # cutoff.rs:97-505 degraded_search_and_score_details
    store = create_index()
    res = run(store, stop_after=stop_after)
    assert res.documents_ids == ids, (stop_after, res.documents_ids)
    assert scores4(res) == scores, (stop_after, scores4(res))
    assert details_kinds(res) == kinds, (stop_after, details_kinds(res))
    assert res.degraded == (stop_after < 6)
