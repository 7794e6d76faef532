"""Device posting-construction parity (SURVEY §7 P1, VERDICT r2 #8):
the segmented-sort build pass (ops/device_build.py) must reproduce the
C++ batch builder's tables byte-identically on a real corpus, so the
device build is a pure transport decision for co-located chips."""

import numpy as np

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.ops.device_build import (
    device_build_postings,
    device_build_pair_postings,
)
from meilisearch_tpu.utils.synthetic import generate_hackernews_like


def build_store(n=5000):
    s = IndexStore("b", primary_key="id")
    s.settings.apply_json(
        {"searchableAttributes": ["title", "author"]}
    )
    s.add_documents(generate_hackernews_like(n))
    return s


def test_word_postings_parity_with_host_builder():
    """Reconstruct word_docids from a raw (word, doc) token stream via the
    device pass; every posting must equal the C++ builder's segments."""
    store = build_store()
    # raw stream straight from the indexed tables' ground truth
    vocab = sorted(store.word_docids.keys())
    widx = {w: i for i, w in enumerate(vocab)}
    keys, docs = [], []
    rng = np.random.default_rng(5)
    for w in vocab:
        ids = store.word_docids[w].ids_array()
        reps = rng.integers(1, 3, size=len(ids))  # inject duplicates
        for d, r in zip(ids.tolist(), reps.tolist()):
            for _ in range(r):
                keys.append(widx[w])
                docs.append(d)
    perm = rng.permutation(len(keys))  # unsorted arrival order
    key_ids, lens, concat = device_build_postings(
        np.array(keys, np.int32)[perm], np.array(docs, np.int32)[perm]
    )
    assert len(key_ids) == len(vocab)
    off = 0
    for ki, ln in zip(key_ids.tolist(), lens.tolist()):
        seg = concat[off : off + ln]
        off += ln
        want = store.word_docids[vocab[ki]].ids_array()
        assert np.array_equal(seg, want), vocab[ki]


def test_pair_postings_min_proximity_parity():
    store = build_store(2000)
    vocab = sorted(
        {w for (_p, a, b) in store.word_pair_proximity_docids for w in (a, b)}
    )
    widx = {w: i for i, w in enumerate(vocab)}
    n_words = len(vocab)
    w1l, w2l, pxl, dl = [], [], [], []
    rng = np.random.default_rng(6)
    for (prox, a, b), posting in store.word_pair_proximity_docids.items():
        for d in posting.ids_array().tolist():
            w1l.append(widx[a])
            w2l.append(widx[b])
            pxl.append(prox)
            dl.append(d)
            # a WORSE (larger) duplicate proximity must lose the dedup
            if rng.random() < 0.3:
                w1l.append(widx[a])
                w2l.append(widx[b])
                pxl.append(prox + 1)
                dl.append(d)
    perm = rng.permutation(len(w1l))
    combo, lens, concat = device_build_pair_postings(
        np.array(w1l, np.int32)[perm],
        np.array(w2l, np.int32)[perm],
        np.array(pxl, np.int32)[perm],
        np.array(dl, np.int32)[perm],
        n_words,
    )
    got = {}
    off = 0
    for c, ln in zip(combo.tolist(), lens.tolist()):
        px = c // (n_words * n_words)
        rest = c % (n_words * n_words)
        a, b = vocab[rest // n_words], vocab[rest % n_words]
        got[(px, a, b)] = concat[off : off + ln]
        off += ln
    # ground truth: min-proximity per (pair, doc) from the store tables
    want = {}
    for (prox, a, b), posting in store.word_pair_proximity_docids.items():
        for d in posting.ids_array().tolist():
            k = (a, b, d)
            if k not in want or prox < want[k]:
                want[k] = prox
    regrouped = {}
    for (a, b, d), prox in want.items():
        regrouped.setdefault((prox, a, b), []).append(d)
    assert set(got) == set(regrouped)
    for k, ids in regrouped.items():
        assert np.array_equal(got[k], np.array(sorted(ids), np.int64)), k
