"""Port of reference tests/sort.rs."""

from .common import build_index, search_ids

DOCS = [
    {"id": 0, "letter": "A", "rank": 0, "vague": 0},
    {"id": 1, "letter": "A", "rank": 1, "vague": "0"},
    {"id": 2, "letter": "B", "rank": 0, "vague": 1},
    {"id": 3, "letter": "B", "rank": 1, "vague": "1"},
    {"id": 4, "letter": "B", "rank": 2, "vague": [1, 2]},
    {"id": 5, "letter": "C", "rank": 0, "vague": [1, "2"]},
    {"id": 6, "letter": "C", "rank": 1},
    {"id": 7, "letter": "C", "rank": 2, "vague": None},
    {"id": 8, "letter": "D", "rank": 0, "vague": [None, None, ""]},
    {"id": 9, "letter": "E", "rank": 0, "vague": ""},
    {"id": 10, "letter": "E", "rank": 1, "vague": {"sub": 0}},
    {"id": 11, "letter": "E", "rank": 2, "vague": True},
    {"id": 12, "letter": "E", "rank": 3, "vague": False},
    {"id": 13, "letter": "E", "rank": 4, "vague": 1.5673},
    {"id": 14, "letter": "E", "rank": 5},
    {"id": 15, "letter": "F", "rank": 0},
    {"id": 16, "letter": "F", "rank": 1},
    {"id": 17, "letter": "F", "rank": 2},
    {"id": 18, "letter": "G", "rank": 0},
    {"id": 19, "letter": "G", "rank": 1},
    {"id": 20, "letter": "H", "rank": 0, "vague": True},
    {"id": 21, "letter": "I", "rank": 0, "vague": False},
    {"id": 22, "letter": "I", "rank": 1, "vague": [1.1367, "help", None]},
    {"id": 23, "letter": "I", "rank": 2, "vague": [1.2367, "hello"]},
]


def make_index():
    return build_index(
        DOCS,
        criteria=["sort"],
        searchable=["text"],
        sortableAttributes=["rank", "vague", "letter"],
    )


def test_sort_letter_desc():
    index = make_index()
    ids = search_ids(index, None, sort_criteria=["letter:desc"])
    assert ids == [21, 22, 23, 20, 18, 19, 15, 16, 17, 9, 10, 11, 12, 13, 14, 8, 5, 6, 7, 2]


def test_sort_rank_desc():
    index = make_index()
    ids = search_ids(index, None, sort_criteria=["rank:desc"])
    assert ids == [14, 13, 12, 4, 7, 11, 17, 23, 1, 3, 6, 10, 16, 19, 22, 0, 2, 5, 8, 9]


def test_sort_vague_asc():
    index = make_index()
    ids = search_ids(index, None, sort_criteria=["vague:asc"])
    assert ids == [0, 2, 4, 5, 22, 23, 13, 1, 3, 12, 21, 11, 20, 6, 7, 8, 9, 10, 14, 15]


def test_sort_vague_desc():
    index = make_index()
    ids = search_ids(index, None, sort_criteria=["vague:desc"])
    assert ids == [4, 13, 23, 22, 2, 5, 0, 11, 20, 12, 21, 3, 1, 6, 7, 8, 9, 10, 14, 15]
