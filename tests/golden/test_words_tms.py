"""Port of /root/reference/crates/milli/src/search/new/tests/words_tms.rs —
terms matching strategies. Expected orderings are the reference's inline
insta snapshots (words_tms.rs:142,192,218,239,255,283,318,366,398,435,461).
"""

from .common import build_index, search_ids

DOCS = [
    {"id": 0, "text": ""},
    {"id": 1, "text": "the"},
    {"id": 2, "text": "the quick"},
    {"id": 3, "text": "the quick brown"},
    {"id": 4, "text": "the quick brown fox"},
    {"id": 5, "text": "the quick brown fox jumps"},
    {"id": 6, "text": "the quick brown fox jumps over"},
    {"id": 7, "text": "the quick brown fox jumps over the"},
    {"id": 8, "text": "the quick brown fox jumps over the lazy"},
    {"id": 9, "text": "the quick brown fox jumps over the lazy dog"},
    {"id": 10, "text": "the brown quick fox jumps over the lazy dog"},
    {"id": 11, "text": "the quick brown fox talks to the lazy and slow dog"},
    {"id": 12, "text": "the quick brown fox talks to the lazy dog"},
    {"id": 13, "text": "the mighty and quick brown fox jumps over the lazy dog"},
    {"id": 14, "text": "the great quick brown fox jumps over the lazy dog"},
    {"id": 15, "text": "this quick brown and very scary fox jumps over the lazy dog"},
    {"id": 16, "text": "this quick brown and scary fox jumps over the lazy dog"},
    {"id": 17, "text": "the quick brown fox jumps over the really lazy dog"},
    {"id": 18, "text": "the brown quick fox jumps over the really lazy dog"},
    {"id": 19, "text": "the brown quick fox immediately jumps over the really lazy dog"},
    {"id": 20, "text": "the brown quick fox immediately jumps over the really lazy blue dog"},
    {"id": 21, "text": "the quick brown. quick brown fox. brown fox jumps. fox jumps over. over the lazy. the lazy dog."},
    {"id": 22, "text": "the, quick, brown, fox, jumps, over, the, lazy, dog"},
]


def make_index(criteria):
    return build_index(DOCS, criteria=criteria, searchable=["text"])


def test_words_tms_last_simple():
    index = make_index(["words"])
    ids = search_ids(index, "the quick brown fox jumps over the lazy dog")
    assert ids == [9, 10, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 8, 6, 7, 5, 4, 11, 12, 3]

    ids = search_ids(index, "extravagant the quick brown fox jumps over the lazy dog")
    assert ids == []


def test_words_tms_last_phrase():
    index = make_index(["words"])
    ids = search_ids(index, '"the quick brown fox" jumps over the lazy dog')
    assert ids == [9, 17, 21, 8, 6, 7, 5, 4, 11, 12]

    ids = search_ids(index, '"the quick brown fox" jumps over the "lazy" dog')
    assert ids == [9, 17, 21, 8, 11, 12]

    ids = search_ids(index, '"the quick brown fox jumps over the lazy dog"')
    assert ids == [9]

    ids = search_ids(index, '"the quick brown fox jumps over the lazy dog')
    assert ids == [9]


def test_words_proximity_tms_last_simple():
    index = make_index(["words", "proximity"])
    ids = search_ids(index, "the quick brown fox jumps over the lazy dog")
    assert ids == [9, 21, 14, 17, 13, 10, 18, 16, 19, 15, 20, 22, 8, 7, 6, 5, 4, 11, 12, 3]

    ids = search_ids(index, "the brown quick fox jumps over the lazy dog")
    assert ids == [10, 18, 19, 9, 20, 21, 14, 17, 13, 15, 16, 22, 8, 7, 6, 5, 4, 11, 12, 3]


def test_words_proximity_tms_last_phrase():
    index = make_index(["words", "proximity"])
    ids = search_ids(index, 'the "quick brown" fox jumps over the lazy dog')
    assert ids == [9, 21, 14, 17, 13, 16, 15, 8, 7, 6, 5, 4, 11, 12, 3]

    ids = search_ids(index, 'the "quick brown" "fox jumps" over the lazy dog')
    assert ids == [9, 21, 14, 17, 13, 16, 15, 8, 7, 6, 5]


def test_words_tms_all():
    index = make_index(["words", "proximity"])
    ids = search_ids(
        index, "the quick brown fox jumps over the lazy dog", strategy="all"
    )
    assert ids == [9, 21, 14, 17, 13, 10, 18, 16, 19, 15, 20, 22]

    ids = search_ids(index, "extravagant", strategy="all")
    assert ids == []


def test_words_tms_attribute_rank_word_position_order_keeps_hits():
    # Reference: words_tms.rs:474 — reordering rules must not drop hits.
    def hit_count(criteria):
        index = make_index(criteria)
        return len(
            search_ids(
                index,
                "the quick brown fox jumps over the lazy dog",
                limit=100,
            )
        )

    words_first = hit_count(
        ["words", "typo", "proximity", "attributeRank", "wordPosition", "exactness"]
    )
    attribute_rank_first = hit_count(
        ["attributeRank", "words", "typo", "proximity", "wordPosition", "exactness"]
    )
    word_position_first = hit_count(
        ["wordPosition", "words", "typo", "proximity", "attributeRank", "exactness"]
    )
    assert words_first == 22
    assert words_first == attribute_rank_first
    assert words_first == word_position_first
