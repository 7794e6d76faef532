"""Port of reference tests/distinct.rs."""

from .common import build_index, search_ids

DOCS = [
    {"id": 0, "letter": "A", "rank1": 0, "text": "the quick brown fox jamps over the lazy dog"},
    {"id": 1, "letter": "A", "rank1": 1, "text": "the quick brown fox jumpes over the lazy dog"},
    {"id": 2, "letter": "B", "rank1": 0, "text": "the quick brown foxjumps over the lazy dog"},
    {"id": 3, "letter": "B", "rank1": 1, "text": "the quick brown fox jumps over the lazy dog"},
    {"id": 4, "letter": "B", "rank1": 2, "text": "the quick brown fox jumps over the lazy"},
    {"id": 5, "letter": "C", "rank1": 0, "text": "the quickbrownfox jumps over the lazy"},
    {"id": 6, "letter": "C", "rank1": 1, "text": "the quick brown fox jumpss over the lazy"},
    {"id": 7, "letter": "C", "rank1": 2, "text": "the quick brown fox jumps over the lazy"},
    {"id": 8, "letter": "D", "rank1": 0, "text": "the quick brown fox jumps over the lazy"},
    {"id": 9, "letter": "E", "rank1": 0, "text": "the quick brown fox jumps over the lazy"},
    {"id": 10, "letter": "E", "rank1": 1, "text": "the quackbrown foxjunps over"},
    {"id": 11, "letter": "E", "rank1": 2, "text": "the quicko browno fox junps over"},
    {"id": 12, "letter": "E", "rank1": 3, "text": "the quicko browno fox jumps over"},
    {"id": 13, "letter": "E", "rank1": 4, "text": "the quick brewn fox jumps over"},
    {"id": 14, "letter": "E", "rank1": 5, "text": "the quick brown fox jumps over"},
    {"id": 15, "letter": "F", "rank1": 0, "text": "the quick brownf fox jumps over"},
    {"id": 16, "letter": "F", "rank1": 1, "text": "the quic brown fox jamps over"},
    {"id": 17, "letter": "F", "rank1": 2, "text": "thequick browns fox jimps"},
    {"id": 18, "letter": "G", "rank1": 0, "text": "the qick brown fox jumps"},
    {"id": 19, "letter": "G", "rank1": 1, "text": "the quick brownfoxjumps"},
    {"id": 20, "letter": "H", "rank1": 0, "text": "the quick brow fox jumps"},
    {"id": 21, "letter": "I", "rank1": 0, "text": "the quick brown fox jpmps"},
    {"id": 22, "letter": "I", "rank1": 1, "text": "the quick brown fox jumps"},
    {"id": 23, "letter": "I", "rank1": 2, "text": "the quick"},
    {"id": 24, "rank1": 0, "text": "the quick"},
    {"id": 25, "rank1": 1, "text": "the quick brown"},
    {"id": 26, "rank1": 2, "text": "the quick brown fox"},
    {"id": 26, "rank1": 3, "text": "the quick brown fox jumps over the lazy dog"},
]

Q = "the quick brown fox jumps over the lazy dog"


def make_index(criteria=("words",), distinct="letter", **extra):
    kw = dict(
        criteria=list(criteria),
        searchable=["text"],
        sortableAttributes=["rank1", "letter"],
        **extra,
    )
    if distinct:
        kw["distinctAttribute"] = distinct
    return build_index(DOCS, **kw)


def test_distinct_placeholder_no_ranking_rules():
    index = make_index()
    ids = search_ids(index, None)
    assert ids == [0, 2, 5, 8, 9, 15, 18, 20, 21, 24, 25, 26]


def test_distinct_at_search_placeholder_no_ranking_rules():
    index = make_index(distinct=None, filterableAttributes=["letter"])
    ids = search_ids(index, None, distinct="letter")
    assert ids == [0, 2, 5, 8, 9, 15, 18, 20, 21, 24, 25, 26]


def test_distinct_placeholder_sort():
    index = make_index(criteria=["sort"])
    ids = search_ids(index, None, sort_criteria=["rank1:desc"])
    assert ids == [14, 26, 4, 7, 17, 23, 1, 19, 25, 8, 20, 24]

    index = make_index(criteria=["sort"])
    ids = search_ids(index, None, sort_criteria=["letter:desc"])
    assert ids == [21, 20, 18, 15, 9, 8, 5, 2, 0, 24, 25, 26]

    index = make_index(criteria=["sort"])
    ids = search_ids(index, None, sort_criteria=["letter:desc", "rank1:desc"])
    assert ids == [23, 20, 19, 17, 14, 8, 7, 4, 1, 26, 25, 24]


def test_distinct_words():
    index = make_index()
    ids = search_ids(index, Q, limit=30)
    assert ids == [0, 2, 26, 5, 8, 9, 15, 18, 20, 21, 25, 24]


def test_distinct_sort_words():
    index = make_index(criteria=["sort", "words", "rank1:desc"])
    ids = search_ids(index, Q, sort_criteria=["letter:desc"], limit=30)
    assert ids == [22, 20, 19, 16, 9, 8, 7, 3, 1, 26, 25, 24]


def test_distinct_all_candidates():
    index = make_index(criteria=["sort"])
    from meilisearch_tpu.search.executor import Search

    s = Search(
        index, query=None, sort_criteria=["rank1:desc"], limit=20,
        exhaustive_number_hits=True,
    )
    res = s.execute()
    assert res.documents_ids == [14, 26, 4, 7, 17, 23, 1, 19, 25, 8, 20, 24]
    assert sorted(res.candidates) == [1, 4, 7, 8, 14, 17, 19, 20, 23, 24, 25, 26]


def test_distinct_typo():
    index = make_index(criteria=["words", "typo"])
    ids = search_ids(index, Q, limit=30)
    assert ids == [3, 26, 0, 7, 8, 9, 15, 22, 18, 20, 25, 24]
