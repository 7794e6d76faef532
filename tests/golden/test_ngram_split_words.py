"""Port of reference tests/ngram_split_words.rs."""

from .common import build_index, search_ids

DOCS = [
    {"id": 0, "text": "the sun flowers are pretty"},
    {"id": 1, "text": "the sun flower is tall"},
    {"id": 2, "text": "the sunflowers are pretty"},
    {"id": 3, "text": "the sunflower is tall"},
    {"id": 4, "text": "the sunflawer is tall"},
    {"id": 5, "text": "sunflowering is not a verb"},
    {"id": 6, "text": "xy z"},
]


def make_index(**extra):
    return build_index(DOCS, criteria=["words"], searchable=["text"], **extra)


NO_TYPOS = {"typoTolerance": {"enabled": False}}


def test_2gram_simple():
    index = make_index(**NO_TYPOS)
    assert search_ids(index, "sun flower", strategy="all") == [0, 1, 2, 3, 5]


def test_3gram_simple():
    index = make_index(**NO_TYPOS)
    assert search_ids(index, "sun flower s are", strategy="all") == [0, 2]


def test_2gram_typo():
    index = make_index()
    assert search_ids(index, "sun flawer", strategy="all") == [0, 1, 2, 3, 4, 5]


def test_no_disable_ngrams():
    index = make_index(**NO_TYPOS)
    # trailing space disables prefix search on the last word
    assert search_ids(index, "sun flower ", strategy="all") == [1, 3]


def test_2gram_prefix():
    index = make_index(**NO_TYPOS)
    assert search_ids(index, "sun flow", strategy="all") == [0, 1, 2, 3, 5]


def test_3gram_prefix():
    index = make_index(**NO_TYPOS)
    assert search_ids(index, "su nf l", strategy="all") == [2, 3, 4, 5]


def test_split_words():
    index = make_index()
    assert search_ids(index, "sunflower ", strategy="all") == [1, 2, 3, 4]


def test_disable_split_words():
    index = make_index(**NO_TYPOS)
    assert search_ids(index, "sunflower ", strategy="all") == [1, 3]


def test_2gram_split_words():
    index = make_index()
    assert search_ids(index, "sunf lower", strategy="all") == [1, 2, 3, 4, 5]


def test_3gram_no_split_words():
    index = make_index()
    assert search_ids(index, "sunf lo wer", strategy="all") == [1, 2, 3, 5]


def test_3gram_no_typos():
    index = make_index()
    assert search_ids(index, "sunf la wer", strategy="all") == [4]


def test_no_ngram_phrases():
    index = make_index()
    assert search_ids(index, '"sun" flower', strategy="all") == [0, 1]
    assert search_ids(index, '"sun" "flower"', strategy="all") == [1]


def test_short_split_words():
    index = make_index()
    assert search_ids(index, "xyz", strategy="all") == [6]


def test_split_words_never_disabled():
    index = make_index(
        typoTolerance={
            "disableOnWords": ["sunflower"],
            "disableOnAttributes": ["text"],
        }
    )
    assert search_ids(index, "the sunflower is tall", strategy="all") == [1, 3]
