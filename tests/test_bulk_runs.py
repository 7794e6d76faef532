"""Bulk-ingest run accumulation: scope semantics + merge equivalence.

Covers `index/runs.py` + `store.begin_bulk/end_bulk/_merge_runs` — the
path every benched 1M index is built through (reference analogue: the
autobatched shared wtxn of scheduler/process_batch.rs plus the grenad
sorter merge of update/new/extract/cache.rs):

  * a bulk multi-chunk ingest must produce posting tables identical to
    one-batch-at-a-time ingestion — every table, facets and positions
    included;
  * end_bulk must bump the generation even when the batch took the
    per-document path (custom dictionary) and left no runs;
  * an abort after a mid-call run merge must not resurrect rolled-back
    content (the marks-based rollback is epoch-guarded);
  * deletes interleaved with a bulk scope stay correct.
"""

import threading

import pytest

from meilisearch_tpu.index.store import AbortedProcessing, IndexStore


def _docs(n, start=0, words=4):
    vocab = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
    ]
    out = []
    for i in range(start, start + n):
        text = " ".join(
            vocab[(i * 7 + j * 3) % len(vocab)] for j in range(words)
        )
        out.append(
            {
                "id": i,
                "title": text,
                "genre": vocab[i % 5],
                "rank": i % 37,
            }
        )
    return out


def _snapshot_tables(store):
    """Every posting table normalized to {key: sorted docids} plus the
    facet columns — the full equivalence surface."""
    snap = {}
    for name in (
        "word_docids",
        "exact_word_docids",
        "word_fid_docids",
        "word_position_docids",
        "word_pair_proximity_docids",
        "field_id_word_count_docids",
        "facet_exists_docids",
        "facet_is_null_docids",
        "facet_is_empty_docids",
    ):
        table = getattr(store, name)
        snap[name] = {k: sorted(table[k]) for k in table.keys()}
    snap["facet_number_docids"] = {
        k: sorted(v) for k, v in store.facet_number_docids.items()
    }
    snap["facet_string_docids"] = {
        k: sorted(v) for k, v in store.facet_string_docids.items()
    }
    snap["docid_facet_numbers"] = {
        k: sorted(v) for k, v in store.docid_facet_numbers.items()
    }
    snap["docid_facet_strings"] = {
        k: sorted(v) for k, v in store.docid_facet_strings.items()
    }
    snap["documents"] = dict(store.documents)
    return snap


def _assert_tables_equal(a, b):
    for name in a:
        assert a[name] == b[name], f"table {name} diverged"


def test_bulk_multichunk_equals_incremental():
    # 16k docs in 4 chunks inside one bulk scope -> crosses the 150k-row
    # RunsBase threshold (merged sorted code columns); the incremental
    # store lands every chunk through the immediate per-batch merge.
    chunks = [_docs(4000, start=i * 4000, words=10) for i in range(4)]

    bulk = IndexStore("bulk")
    with bulk.bulk():
        for c in chunks:
            bulk.add_documents(c)

    incr = IndexStore("incr")
    for c in chunks:
        incr.add_documents(c)

    _assert_tables_equal(_snapshot_tables(bulk), _snapshot_tables(incr))
    assert bulk.get_word_docids("alpha") == incr.get_word_docids("alpha")


def test_bulk_replace_during_scope_equals_incremental():
    # replacing docs whose postings still sit in unmerged runs forces
    # the mid-scope merge path; the result must match incremental
    first = _docs(500)
    replacement = [
        {"id": i, "title": f"replaced text {i}", "genre": "zulu"}
        for i in range(0, 500, 7)
    ]

    bulk = IndexStore("bulk")
    with bulk.bulk():
        bulk.add_documents(first)
        bulk.add_documents(replacement)

    incr = IndexStore("incr")
    incr.add_documents(first)
    incr.add_documents(replacement)

    _assert_tables_equal(_snapshot_tables(bulk), _snapshot_tables(incr))


def test_delete_during_bulk():
    store = IndexStore("t")
    with store.bulk():
        store.add_documents(_docs(300))
        # the delete lands while postings are still in runs: the remove
        # path must fold them first, not leave dangling docids
        store.delete_documents([str(i) for i in range(0, 300, 3)])

    incr = IndexStore("i")
    incr.add_documents(_docs(300))
    incr.delete_documents([str(i) for i in range(0, 300, 3)])

    _assert_tables_equal(_snapshot_tables(store), _snapshot_tables(incr))


def test_end_bulk_bumps_generation_on_per_document_path():
    # a custom dictionary forces use_batch=False: no runs exist, but the
    # generation must still bump or generation-keyed caches (docids
    # cache, device arena) keep serving pre-batch results
    store = IndexStore("t")
    store.settings.apply_json({"dictionary": ["foobar"]})
    store.add_documents([{"id": 0, "title": "seed doc"}])
    gen0 = store.generation
    with store.bulk():
        store.add_documents(
            [{"id": i, "title": f"fresh doc {i}"} for i in range(1, 6)]
        )
    assert store.generation > gen0, "end_bulk did not bump the generation"
    assert len(store.documents_ids()) == 6
    assert store.get_word_docids("fresh") == {1, 2, 3, 4, 5}


def test_abort_after_midcall_merge_no_ghosts():
    # call #1 leaves its run pending in the bulk scope; call #2 first
    # replaces a call-#1 doc (docid sits in _run_docids -> mid-call
    # _merge_runs resets the run lists and invalidates the marks), then
    # streams enough fresh docs to trip the 32768-doc flush (a run
    # appended AFTER the merge), then aborts. The epoch guard must drop
    # that run entirely — pre-fix, the stale marks kept it and the next
    # merge installed postings for rolled-back documents.
    store = IndexStore("t")
    with store.bulk():
        store.add_documents(
            [{"id": "a", "title": "anchor one"}, {"id": "b", "title": "anchor two"}]
        )
        assert store._token_runs, "precondition: call #1 run pending"

        stop = threading.Event()

        def stream():
            yield {"id": "a", "title": "anchor replaced"}  # mid-call merge
            for i in range(33000):
                yield {"id": f"g{i}", "title": f"ghostword{i} filler"}
            stop.set()
            yield {"id": "tail", "title": "never lands"}

        with pytest.raises(AbortedProcessing):
            store.add_documents(stream(), must_stop=stop)

    assert len(store.documents) == 2
    assert store.get_word_docids("ghostword100") == set()
    assert store.get_word_docids("ghostword32900") == set()
    assert store.get_word_docids("filler") == set()
    # the replaced doc rolled back to its original content
    ids = {store.internal_to_external[d] for d in store.documents}
    assert ids == {"a", "b"}
    assert store.get_word_docids("replaced") == set()
    assert store.get_word_docids("anchor") == set(store.documents.keys())


# ---------------------------------------------------------------------------
# extractor<->writer overlap (MEILI_TPU_INGEST_OVERLAP=1): the native
# tokenize of chunk N runs on a worker thread while the writer indexes
# facets and preps chunk N+1 (reference update/new/channel.rs:54). The
# tables must come out identical to the serial path, including when an
# in-flight document is replaced or the batch aborts mid-stream.


def _ingest(docs, overlap, monkeypatch, chunk=16, bulk=False, name="t"):
    monkeypatch.setenv("MEILI_TPU_INGEST_OVERLAP", "1" if overlap else "0")
    monkeypatch.setattr(
        "meilisearch_tpu.index.store.BATCH_TOKEN_CHUNK", chunk
    )
    store = IndexStore(f"{name}-{'ov' if overlap else 'ser'}", primary_key="id")
    store.settings.apply_json(
        {
            "searchableAttributes": ["title"],
            "filterableAttributes": ["genre", "rank"],
            "sortableAttributes": ["rank"],
        }
    )
    if bulk:
        with store.bulk():
            store.add_documents(docs)
    else:
        store.add_documents(docs)
    return store


@pytest.mark.parametrize("bulk", [False, True])
def test_overlap_equals_serial(monkeypatch, bulk):
    docs = _docs(200)
    a = _ingest(docs, True, monkeypatch, bulk=bulk)
    b = _ingest(docs, False, monkeypatch, bulk=bulk)
    assert a._native_inflight is None
    _assert_tables_equal(_snapshot_tables(a), _snapshot_tables(b))


def test_overlap_replace_of_inflight_doc(monkeypatch):
    """A document whose postings are still in flight gets replaced later
    in the SAME call: the replace must route through the drain (its
    docids entered _run_docids at submit time) and leave no ghosts."""
    docs = _docs(40)
    replaced = dict(docs[2])
    replaced["title"] = "zulu yankee xray"
    stream = docs + [replaced] + _docs(8, start=40)
    a = _ingest(stream, True, monkeypatch, chunk=8, name="rep")
    b = _ingest(stream, False, monkeypatch, chunk=8, name="rep")
    _assert_tables_equal(_snapshot_tables(a), _snapshot_tables(b))
    # the old title's tokens must not hit doc 2 anymore
    from meilisearch_tpu.search.perform import perform_search

    res = perform_search(a, {"q": "zulu", "limit": 5})
    assert [h["id"] for h in res["hits"]] == [2]


def test_overlap_abort_rolls_back_inflight(monkeypatch):
    """must_stop set mid-stream with a build in flight: the drain lands
    the run before the mark logic, the rollback drops it, and the store
    equals its pre-call state."""
    monkeypatch.setenv("MEILI_TPU_INGEST_OVERLAP", "1")
    monkeypatch.setattr(
        "meilisearch_tpu.index.store.BATCH_TOKEN_CHUNK", 8
    )
    store = IndexStore("t-abort-ov", primary_key="id")
    store.settings.apply_json({"searchableAttributes": ["title"]})
    store.add_documents(_docs(10))
    before = _snapshot_tables(store)
    stop = threading.Event()
    n_seen = 0

    def stream():
        nonlocal n_seen
        for d in _docs(30, start=10):
            n_seen += 1
            if n_seen == 25:
                stop.set()
            yield d

    with pytest.raises(AbortedProcessing):
        store.add_documents(stream(), must_stop=stop)
    assert store._native_inflight is None
    _assert_tables_equal(_snapshot_tables(store), before)
