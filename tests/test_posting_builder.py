"""Native batch posting builder vs the per-document Python path.

The batch path (native/posting_builder.cpp) must produce byte-identical
posting tables to IndexStore._index_document_tokens for any corpus it
accepts, and must hand mixed-script documents back to the Python path.
"""

import random

import pytest

from meilisearch_tpu.index.arrays import to_array
from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.utils.synthetic import generate_hackernews_like

TABLES = [
    "word_docids",
    "exact_word_docids",
    "word_fid_docids",
    "word_position_docids",
    "word_pair_proximity_docids",
    "field_id_word_count_docids",
]


def _tables(store, by_external=False):
    out = {}
    ext = store.internal_to_external
    for name in TABLES:
        t = {}
        for k, v in getattr(store, name).items():
            arr = to_array(v)
            if len(arr):
                ids = arr.tolist()
                t[k] = sorted(ext[d] for d in ids) if by_external else ids
        out[name] = t
    return out


def _per_doc_store(uid, docs, settings=None):
    store = IndexStore(uid)
    # force the per-document Python path
    store._index_documents_batch = lambda pending: [d for d, _ in pending]
    if settings:
        store.settings.apply_json(settings)
    store.add_documents(docs)
    return store


def assert_identical(docs, settings=None):
    s1 = IndexStore("batch")
    if settings:
        s1.settings.apply_json(settings)
    s1.add_documents(docs)
    s2 = _per_doc_store("perdoc", docs, settings)
    t1, t2 = _tables(s1), _tables(s2)
    for name in TABLES:
        assert t1[name] == t2[name], name


def test_differential_synthetic_corpus():
    assert_identical(generate_hackernews_like(1500))


def test_differential_nested_and_scalars():
    docs = [
        {
            "id": i,
            "title": f"doc {i} grand piano",
            "meta": {"tags": ["alpha beta", "gamma"], "rank": i * 1.5},
            "flag": i % 2 == 0,
            "count": i * 7,
            "empty": "",
            "none": None,
        }
        for i in range(50)
    ]
    assert_identical(docs)


def test_differential_with_stop_words():
    docs = [
        {"id": i, "t": f"the quick brown fox {i} jumps over the lazy dog"}
        for i in range(40)
    ]
    assert_identical(docs, settings={"stopWords": ["the", "over"]})


def test_differential_with_exact_attributes():
    docs = [{"id": i, "t": f"alpha {i}", "e": f"beta {i}"} for i in range(40)]
    assert_identical(
        docs,
        settings={
            "typoTolerance": {"disableOnAttributes": ["e"]},
        },
    )


def test_mixed_script_docs_fall_back():
    """A CJK doc goes through the Python tokenizer; results still match."""
    docs = [
        {"id": 1, "t": "plain latin text"},
        {"id": 2, "t": "日本語のテキスト"},
        {"id": 3, "t": "mixed 語 latin"},
        {"id": 4, "t": "more latin"},
    ]
    assert_identical(docs)


def test_update_and_delete_after_batch_build():
    """Per-document removal must exactly undo batch-built postings."""
    docs = generate_hackernews_like(300)
    store = IndexStore("x")
    store.add_documents(docs)
    # replace half the docs, delete a quarter
    rng = random.Random(7)
    replacements = [
        {**d, "title": d.get("title", "") + " updated"}
        for d in rng.sample(docs, 150)
    ]
    store.add_documents(replacements, method="replace")
    to_delete = [str(d["id"]) for d in rng.sample(docs, 75)]
    store.delete_documents(to_delete)

    # oracle: rebuild from the surviving documents per-doc
    survivors = [store.documents[d] for d in sorted(store.documents)]
    oracle = _per_doc_store("oracle", survivors)
    # docid assignment differs (replacements keep ids, the oracle renumbers):
    # compare posting content via external document ids
    t1, t2 = _tables(store, by_external=True), _tables(oracle, by_external=True)
    for name in TABLES:
        assert t1[name] == t2[name], name


def test_same_external_id_twice_in_one_batch():
    store = IndexStore("dup")
    store.add_documents(
        [
            {"id": 1, "t": "first version"},
            {"id": 2, "t": "other"},
            {"id": 1, "t": "second version"},
        ]
    )
    oracle = _per_doc_store(
        "oracle2", [{"id": 2, "t": "other"}, {"id": 1, "t": "second version"}]
    )
    # same non-empty words present (a fully-tombstoned key may linger as an
    # empty posting; that is memory hygiene, not semantics)
    assert set(_tables(store)["word_docids"]) == set(
        _tables(oracle)["word_docids"]
    )
    from meilisearch_tpu.search.perform import perform_search

    res = perform_search(store, {"q": "second"})
    assert [h["id"] for h in res["hits"]] == [1]
    res = perform_search(store, {"q": "first"})
    assert res["hits"] == []
