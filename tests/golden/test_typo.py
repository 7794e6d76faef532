"""Port of /root/reference/crates/milli/src/search/new/tests/typo.rs.
Expected orderings are the reference's inline insta snapshots."""

from .common import build_index, search_ids

DOCS = [
    {"id": 0, "text": "the quick brown fox jumps over the lazy dog"},
    {"id": 1, "text": "the quick brown foxes jump over the lazy dog"},
    {"id": 2, "text": "the quick brown fax sends a letter to the dog"},
    {"id": 3, "text": "the quickest brownest fox jumps over the laziest dog"},
    {"id": 4, "text": "a fox doesn't quack, that crown goes to the duck."},
    {"id": 5, "text": "the quicker browner fox jumped over the lazier dog"},
    {"id": 6, "text": "the extravagant fox skyrocketed over the languorous dog"},
    {"id": 7, "text": "the quick brown fox jumps over the lazy"},
    {"id": 8, "text": "the quick brown fox jumps over the"},
    {"id": 9, "text": "the quick brown fox jumps over"},
    {"id": 10, "text": "the quick brown fox jumps"},
    {"id": 11, "text": "the quick brown fox"},
    {"id": 12, "text": "the quick brown"},
    {"id": 13, "text": "the quick"},
    {"id": 14, "text": "netwolk interconections sunflawar"},
    {"id": 15, "text": "network interconnections sunflawer"},
    {"id": 16, "text": "network interconnection sunflower"},
    {"id": 17, "text": "network interconnection sun flower"},
    {"id": 18, "text": "network interconnection sunflowering"},
    {"id": 19, "text": "network interconnection sun flowering"},
    {"id": 20, "text": "network interconnection sunflowar"},
    {"id": 21, "text": "the fast brownish fox jumps over the lackadaisical dog"},
    {"id": 22, "text": "the quick brown fox jumps over the lackadaisical dog"},
    {"id": 23, "text": "the quivk brown fox jumps over the lazy dog"},
    {"id": 24, "tolerant_text": "the quick brown fox jumps over the lazy dog"},
    {"id": 25, "tolerant_text": "the quivk brown fox jumps over the lazy dog"},
]


def make_index(criteria=("words",), **extra):
    return build_index(DOCS, criteria=list(criteria), searchable=["text"], **extra)


def test_no_typo():
    index = make_index(typoTolerance={"enabled": False})
    ids = search_ids(index, "the quick brown fox jumps over the lazy dog", strategy="all")
    assert ids == [0]


def test_default_typo():
    index = make_index()
    # 0 typo (quivk matched via 1 typo... both have all words)
    ids = search_ids(index, "the quick brown fox jumps over the lazy dog", strategy="all")
    assert ids == [0, 23]
    # 1 typo on one word, replaced letter
    ids = search_ids(index, "the quack brown fox jumps over the lazy dog", strategy="all")
    assert ids == [0]
    # 1 typo on several words: missing letter, extra letter
    ids = search_ids(index, "the quicest brownest fox jummps over the laziest dog", strategy="all")
    assert ids == [3]


def test_phrase_no_typo_allowed():
    index = make_index()
    ids = search_ids(index, 'the "quick brewn" fox jumps over the lazy dog', strategy="all")
    assert ids == []


def test_typo_exact_word():
    index = make_index(
        typoTolerance={"disableOnWords": ["quick", "quack", "sunflower"]}
    )
    ids = search_ids(index, "the quick brown fox jumps over the lazy dog", strategy="all")
    assert ids == [0]
    # quack may not match quick by typo
    ids = search_ids(index, "the quack brown fox jumps over the lazy dog", strategy="all")
    assert ids == []
    # words not in exact_words keep typo handling
    ids = search_ids(index, "the quicest brownest fox jummps over the laziest dog", strategy="all")
    assert ids == [3]
    # exact words do not disable prefix matching
    ids = search_ids(index, "network interconnection sunflower", strategy="all")
    assert ids == [16, 17, 18]


def test_typo_exact_attribute():
    index = build_index(
        DOCS,
        criteria=["words"],
        searchable=["text", "tolerant_text"],
        typoTolerance={
            "disableOnAttributes": ["text"],
            "disableOnWords": ["quivk"],
        },
    )
    ids = search_ids(index, "the quick brown fox jumps over the lazy dog", strategy="all")
    assert ids == [0, 24, 25]
    # 1 typo only returns the tolerant attribute
    ids = search_ids(index, "the quidk brown fox jumps over the lazy dog", strategy="all")
    assert ids == [24, 25]
    # combine with exact words
    ids = search_ids(index, "the quivk brown fox jumps over the lazy dog", strategy="all")
    assert ids == [23, 25]
    # no result in tolerant attribute
    ids = search_ids(index, "the quicest brownest fox jummps over the laziest dog", strategy="all")
    assert ids == []


def test_ngram_typos():
    index = make_index()
    ids = search_ids(index, "the extra lagant fox skyrocketed over the languorous dog", strategy="all")
    assert ids == [6]
    # 3grams are not typo tolerant
    ids = search_ids(index, "the ex tra lagant fox skyrocketed over the languorous dog", strategy="all")
    assert ids == []


def test_typo_ranking_rule_not_preceded_by_words_ranking_rule():
    expected = [0, 23, 7, 8, 9, 22, 10, 11, 1, 2, 12, 13, 4, 3, 5, 6, 21]
    index = make_index(criteria=["typo"])
    ids1 = search_ids(index, "the quick brown fox jumps over the lazy dog", limit=50)
    assert ids1 == expected
    index = make_index(criteria=["words", "typo"])
    ids2 = search_ids(index, "the quick brown fox jumps over the lazy dog", limit=50)
    assert ids2 == expected


def test_typo_bucketing():
    index = make_index(criteria=["words"])
    ids = search_ids(index, "network interconnection sunflower", strategy="all")
    assert ids == [14, 15, 16, 17, 18, 20]

    index = make_index(criteria=["typo"])
    ids = search_ids(index, "network interconnection sunflower", strategy="all")
    assert ids == [16, 18, 17, 20, 15, 14]
    ids = search_ids(index, "network interconnection sun flower", strategy="all")
    assert ids == [17, 19, 16, 18, 20, 15]


def test_typo_synonyms():
    index = make_index(
        criteria=["typo"],
        synonyms={
            "lackadaisical": ["lazy"],
            "fast brownish": ["quick brown"],
        },
    )
    ids = search_ids(index, "the quick brown fox jumps over the lackadaisical dog", strategy="all")
    assert ids == [0, 22, 23]
    # ngram+synonym interaction: multi-word synonyms get a typo cost
    ids = search_ids(index, "the fast brownish fox jumps over the lackadaisical dog", strategy="all")
    assert ids == [21, 0, 22]
