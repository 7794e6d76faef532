"""Ports of reference tests/attribute_fid.rs and tests/word_position.rs.
Expected orders extracted from the reference insta snapshot files."""

from .common import build_index, search_ids

FID_DOCS = [
    {"id": 0, "title": "", "description": "", "plot": "the quick brown fox jumps over the lazy dog"},
    {"id": 1, "title": "", "description": "the quick brown foxes jump over the lazy dog", "plot": ""},
    {"id": 2, "title": "the quick brown fox jumps over the lazy dog", "description": "", "plot": ""},
    {"id": 3, "title": "the", "description": "quick brown fox jumps over the lazy dog", "plot": ""},
    {"id": 4, "title": "the quick", "description": "brown fox jumps over the lazy dog", "plot": ""},
    {"id": 5, "title": "the quick brown", "description": "fox jumps over the lazy dog", "plot": ""},
    {"id": 6, "title": "the quick brown fox", "description": "jumps over the lazy dog", "plot": ""},
    {"id": 7, "title": "the quick", "description": "brown fox jumps", "plot": "over the lazy dog"},
    {"id": 8, "title": "the quick brown", "description": "fox", "plot": "jumps over the lazy dog"},
    {"id": 9, "title": "the quick brown", "description": "fox jumps", "plot": "over the lazy dog"},
    {"id": 10, "title": "", "description": "the quick brown fox", "plot": "jumps over the lazy dog"},
    {"id": 11, "title": "the quick", "description": "", "plot": "brown fox jumps over the lazy dog"},
    {"id": 12, "title": "", "description": "the quickbrownfox", "plot": "jumps over the lazy dog"},
    {"id": 13, "title": "", "description": "the quick brown fox", "plot": "jumps over the lazy dog"},
    {"id": 14, "title": "", "description": "the quickbrownfox", "plot": "jumps overthelazy dog"},
]


def test_attribute_fid_simple_and_ngrams():
    index = build_index(
        FID_DOCS,
        criteria=["attribute"],
        searchable=["title", "description", "plot"],
    )
    ids = search_ids(index, "the quick brown fox jumps over the lazy dog", strategy="all")
    assert ids == [2, 6, 5, 4, 3, 9, 8, 7, 11, 10, 13, 12, 14, 0]


# exact word counts from the reference fixture (word_position.rs:20-140)
POS_DOCS = [
    {"id": 0, "text": "do you know about the quick and talented brown fox"},
    {"id": 1, "text": "do you know about the quick brown fox"},
    {"id": 2, "text": "the quick and talented brown fox"},
    {"id": 3, "text": "fox brown quick the"},
    {"id": 4, "text": "the quick brown fox"},
    {"id": 5, "text": " ".join(["a"] * 1345) + " the quick brown fox"},
    {"id": 6, "text": "quick " + " ".join(["a"] * 168) + " brown"},
    {"id": 7, "text": " ".join(["a"] * 170) + " quickbrown"},
    {"id": 8, "text": " ".join(["a"] * 170) + " quick brown"},
    {"id": 9, "text": " ".join(["a"] * 170) + " quickbrown"},
    {"id": 10, "text": "quick brown", "text2": "brown quick"},
    {"id": 11, "text": "quickbrown"},
    {"id": 12, "text": "quick brown"},
    {"id": 13, "text": "quickbrown"},
]


def make_pos_index():
    return build_index(
        POS_DOCS,
        criteria=["attribute"],
        searchable=["text", "text2", "other"],
    )


def test_attribute_position_simple():
    index = make_pos_index()
    ids = search_ids(index, "quick brown", strategy="all")
    assert ids == [10, 12, 11, 13, 3, 4, 2, 0, 1, 6, 8, 7, 9, 5]


def test_attribute_position_repeated():
    index = make_pos_index()
    ids = search_ids(index, "a a a a a", strategy="all")
    assert ids == [5, 7, 8, 9, 6]
