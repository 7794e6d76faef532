"""Port of reference tests/stop_words.rs."""

from .common import build_index, search_ids

DOCS = [
    {"id": 0, "title": "Shazam!"},
    {"id": 1, "title": "Captain Marvel"},
    {"id": 2, "title": "Escape Room"},
    {"id": 3, "title": "How to Train Your Dragon: The Hidden World"},
    {"id": 4, "title": "Gläss"},
    {"id": 5, "title": "How to Attempt to Train Your Dragon"},
    {"id": 6, "title": "How to Train Your Dragon: the Hidden World"},
]


def make_index():
    return build_index(
        DOCS, searchable=["title"], stopWords=["to", "The", "xyz"]
    )


def test_stop_words_not_indexed():
    index = make_index()
    assert "to" not in index.word_docids
    assert "xyz" not in index.word_docids
    # "The" (doc 3) is a stop word; "the" (doc 6) is not
    assert index.get_word_docids("the") == {6}


def test_ignore_stop_words():
    index = make_index()
    assert search_ids(index, "xyz to the") == [6]
    assert search_ids(index, "to the xyz") == [6]
    assert search_ids(index, "to the xyz ") == [6]
    assert search_ids(index, "to the dragon xyz") == [6]


def test_stop_words_in_phrase():
    index = make_index()
    assert search_ids(index, '"how to train your dragon"') == [3, 6]
    assert search_ids(index, 'how "to" train "the') == [6]
    assert search_ids(index, 'how "to" train "The dragon') == [3, 6, 5]
    # a query of only stop words becomes a placeholder search
    assert search_ids(index, '"to"') == [0, 1, 2, 3, 4, 5, 6]
