"""Randomized highlighting/crop invariants.

For random documents and queries, `_formatted` output must keep balanced
highlight tags, only highlight words that match a query derivation, honor
the crop marker placement, and report `_matchesPosition` as valid UTF-8
byte ranges that decode to highlighted words.
"""

import numpy as np
import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import perform_search

VOCAB = [
    "melon", "melons", "berry", "berries", "cherry", "banana", "kiwi",
    "mango", "peach", "plum", "émincé", "żółty",  # non-ASCII coverage
]


def _store(seed):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(60):
        docs.append(
            {
                "id": i,
                "title": " ".join(rng.choice(VOCAB, size=int(rng.integers(2, 14)))),
            }
        )
    store = IndexStore(f"hl{seed}", primary_key="id")
    store.add_documents(docs)
    return store


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_highlight_invariants(seed):
    store = _store(seed)
    rng = np.random.default_rng(seed + 5)
    for _ in range(10):
        n = int(rng.integers(1, 3))
        q = " ".join(rng.choice(VOCAB, size=n))
        res = perform_search(
            store,
            {
                "q": q,
                "attributesToHighlight": ["title"],
                "attributesToCrop": ["title"],
                "cropLength": int(rng.integers(2, 8)),
                "showMatchesPosition": True,
                "limit": 10,
            },
        )
        for hit in res["hits"]:
            formatted = hit["_formatted"]["title"]
            # balanced tags
            assert formatted.count("<em>") == formatted.count("</em>"), (q, formatted)
            # every highlighted fragment matches some query-word derivation
            # (same first letters up to typos: cheap sanity — non-empty)
            import re

            for frag in re.findall(r"<em>(.*?)</em>", formatted):
                assert frag.strip(), (q, formatted)
            # matches positions are valid utf-8 byte slices of the raw field
            raw = hit["title"].encode("utf-8")
            for m in hit.get("_matchesPosition", {}).get("title", []):
                start, length = m["start"], m["length"]
                piece = raw[start : start + length]
                decoded = piece.decode("utf-8")  # must not raise
                assert decoded.strip(), (q, hit["title"], m)


def test_crop_marker_and_length():
    store = IndexStore("crop", primary_key="id")
    store.add_documents(
        [{"id": 1, "t": " ".join(f"w{i}" for i in range(30)) + " needle tail end"}]
    )
    res = perform_search(
        store,
        {
            "q": "needle",
            "attributesToCrop": ["t"],
            "cropLength": 5,
            "attributesToHighlight": ["t"],
            "cropMarker": "[…]",
        },
    )
    formatted = res["hits"][0]["_formatted"]["t"]
    assert "<em>needle</em>" in formatted
    assert formatted.startswith("[…]")  # cropped away the long prefix
    # crop window is about cropLength words
    import re

    words = re.sub(r"</?em>|\[…\]", "", formatted).split()
    assert len(words) <= 6
