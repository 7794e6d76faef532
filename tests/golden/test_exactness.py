"""Port of /root/reference/crates/milli/src/search/new/tests/exactness.rs.
Expected orderings from the reference's snapshot files."""

from .common import build_index, search_ids

Q = "the quick brown fox jumps over the lazy dog"


def idx(docs, criteria):
    return build_index(docs, criteria=criteria, searchable=["text"])


ORDERED = [
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
]

REVERSED = [
    {"id": 0, "text": ""},
    {"id": 1, "text": "dog"},
    {"id": 2, "text": "lazy dog"},
    {"id": 3, "text": "the lazy dog"},
    {"id": 4, "text": "over the lazy dog"},
    {"id": 5, "text": "jumps over the lazy dog"},
    {"id": 6, "text": "fox jumps over the lazy dog"},
    {"id": 7, "text": "brown fox jumps over the lazy dog"},
    {"id": 8, "text": "quick brown fox jumps over the lazy dog"},
    {"id": 9, "text": "the quick brown fox jumps over the lazy dog"},
]

RANDOM = [
    {"id": 0, "text": ""},
    {"id": 1, "text": "over"},
    {"id": 2, "text": "jump dog"},
    {"id": 3, "text": "brown the lazy"},
    {"id": 4, "text": "jump dog quick the"},
    {"id": 5, "text": "fox the lazy dog brown"},
    {"id": 6, "text": "jump fox quick lazy the dog"},
    {"id": 7, "text": "the dog brown over jumps quick lazy"},
    {"id": 8, "text": "the jumps dog quick over brown lazy fox"},
]

STARTS_WITH = [
    {"id": 0, "text": "what a lovely view from this balcony, I love it"},
    {"id": 1, "text": "this balcony is overlooking the sea"},
    {"id": 2, "text": "this balcony"},
    {"id": 3, "text": "over looking the sea is a beautiful balcony"},
    {"id": 4, "text": "a beautiful balcony is overlooking the sea"},
    {"id": 5, "text": "overlooking the sea is a beautiful balcony, I love it"},
    {"id": 6, "text": "overlooking the sea is a beautiful balcony"},
    {"id": 7, "text": "overlooking"},
]

ORDERED_WITH_TYPOS = [
    {"id": 0, "text": ""},
    {"id": 1, "text": "the"},
    {"id": 2, "text": "the quack"},
    {"id": 3, "text": "the quack briwn"},
    {"id": 4, "text": "the quack briwn fox"},
    {"id": 5, "text": "the quack briwn fox jlmps"},
    {"id": 6, "text": "the quack briwn fox jlmps over"},
    {"id": 7, "text": "the quack briwn fox jlmps over the"},
    {"id": 8, "text": "the quack briwn fox jlmps over the lazy"},
    {"id": 9, "text": "the quack briwn fox jlmps over the lazy dog"},
    {"id": 10, "text": ""},
    {"id": 11, "text": "the"},
    {"id": 12, "text": "the quick"},
    {"id": 13, "text": "the quick brown"},
    {"id": 14, "text": "the quick brown fox"},
    {"id": 15, "text": "the quick brown fox jumps"},
    {"id": 16, "text": "the quick brown fox jumps over"},
    {"id": 17, "text": "the quick brown fox jumps over the"},
    {"id": 18, "text": "the quick brown fox jumps over the lazy"},
    {"id": 19, "text": "the quick brown fox jumps over the lazy dog"},
]

VARYING_PROX = [
    {"id": 0, "text": "lazy jumps dog brown quick the over fox the"},
    {"id": 1, "text": "the quick brown fox jumps over the very lazy dog"},
    {"id": 2, "text": "the quick brown fox jumps over the lazy dog"},
    {"id": 3, "text": "dog brown quick the over fox the lazy"},
    {"id": 4, "text": "the quick brown fox over the very lazy dog"},
    {"id": 5, "text": "the quick brown fox over the lazy dog"},
    {"id": 6, "text": "brown quick the over fox"},
    {"id": 7, "text": "the very quick brown fox over"},
    {"id": 8, "text": "the quick brown fox over"},
]

TYPO_AND_PREFIX = [
    {"id": 0, "text": "expraordinarily quick brown fox"},
    {"id": 1, "text": "extraordinarily quick brown fox"},
    {"id": 2, "text": "extra quick brown fox"},
    {"id": 3, "text": "expraordinarily quack brown fox"},
    {"id": 4, "text": "expraordinapily quick brown fox"},
]

IGNORED_TERMS_PROX = [
    {"id": 0, "text": "lazy jumps dog brown quick the over fox the"},
    {"id": 1, "text": "lazy jumps dog brown quick the over fox the. quack briwn jlmps"},
    {"id": 2, "text": "lazy jumps dog brown quick the over fox the. quack briwn jlmps overt"},
]


def test_exactness_simple_ordered():
    index = idx(ORDERED, ["exactness"])
    assert search_ids(index, Q) == [9, 8, 7, 6, 5, 4, 3, 2, 1]


def test_exactness_simple_reversed():
    index = idx(REVERSED, ["exactness"])
    assert search_ids(index, Q) == [9, 8, 3, 4, 5, 6, 7]
    assert search_ids(index, "the quick brown fox jumps over the lazy dog") == [
        9, 8, 3, 4, 5, 6, 7,
    ]


def test_exactness_simple_random():
    index = idx(RANDOM, ["exactness"])
    assert search_ids(index, Q) == [8, 7, 4, 6, 3, 5]


def test_exactness_attribute_starts_with_simple():
    index = idx(STARTS_WITH, ["exactness"])
    assert search_ids(index, "this balcony") == [2, 1, 0]


def test_exactness_attribute_starts_with_phrase():
    index = idx(STARTS_WITH, ["exactness"])
    assert search_ids(index, '"overlooking the sea" is a beautiful balcony') == [6, 5, 4, 1]
    assert search_ids(index, "overlooking the sea is a beautiful balcony") == [6, 5, 4, 3, 1, 7]


def test_exactness_all_candidates_with_typo():
    index = idx(STARTS_WITH, ["exactness"])
    assert search_ids(index, "overlocking the sea is a beautiful balcony") == [4, 5, 6, 1, 7]


def test_exactness_after_words():
    index = idx(ORDERED_WITH_TYPOS, ["words", "exactness"])
    assert search_ids(index, Q, limit=50) == [
        19, 9, 18, 8, 17, 16, 6, 7, 15, 5, 14, 4, 13, 3, 12, 2, 1, 11,
    ]


def test_words_after_exactness():
    index = idx(ORDERED_WITH_TYPOS, ["exactness", "words"])
    assert search_ids(index, Q, limit=50) == [
        19, 9, 18, 8, 17, 16, 6, 7, 15, 5, 14, 4, 13, 3, 12, 2, 1, 11,
    ]


def test_proximity_after_exactness():
    index = idx(VARYING_PROX, ["exactness", "words", "proximity"])
    assert search_ids(index, Q) == [2, 1, 0, 4, 5, 8, 7, 3, 6]

    index = idx(IGNORED_TERMS_PROX, ["exactness", "words", "proximity"])
    assert search_ids(index, Q) == [0, 1, 2]


def test_exactness_followed_by_typo_prefer_no_typo_prefix():
    index = idx(TYPO_AND_PREFIX, ["exactness", "words", "typo"])
    assert search_ids(index, "quick brown fox extra") == [2, 1, 0, 4, 3]


def test_typo_followed_by_exactness():
    index = idx(TYPO_AND_PREFIX, ["words", "typo", "exactness"])
    assert search_ids(index, "extraordinarily quick brown fox") == [1, 0, 4, 3]
