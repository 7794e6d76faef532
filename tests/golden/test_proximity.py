"""Port of /root/reference/crates/milli/src/search/new/tests/proximity.rs."""

from .common import build_index, search_ids

SIMPLE_DOCS = [
    {"id": 0, "text": "the very quick dark brown and smart fox did jump over the terribly lazy and small dog"},
    {"id": 1, "text": "the. quick brown fox jumps over the lazy. dog"},
    {"id": 2, "text": "the quick brown fox jumps over the lazy. dog"},
    {"id": 3, "text": "dog the quick brown fox jumps over the lazy"},
    {"id": 4, "text": "the quickbrown fox jumps over the lazy dog"},
    {"id": 5, "text": "brown quick fox jumps over the lazy dog"},
    {"id": 6, "text": "the really quick brown fox jumps over the very lazy dog"},
    {"id": 7, "text": "the really quick brown fox jumps over the lazy dog"},
    {"id": 8, "text": "the quick brown fox jumps over the lazy"},
    # id 9 appears twice in the reference fixture; the second wins (replace)
    {"id": 9, "text": "the quack brown fox jumps over the lazy"},
    {"id": 9, "text": "the quack brown fox jumps over the lazy dog"},
    {"id": 10, "text": "the quick brown fox jumps over the lazy dog"},
]


def letters_docs():
    """The edge-cases fixture (proximity.rs:86 create_edge_cases_index)."""
    import itertools

    def grid(first):
        # e.g. "saa sab sac ... sasa ... saz sba ..." as in the fixture
        rows = []
        for b in "abcdefgks lmnopqrst"[:0]:
            pass
        return rows

    s_text = []
    for b in "abcdefg" + "klmnopqrst":
        row = []
        for c in "abc" + "efghijklmnopqr" + "s" + "tuvwxyz":
            if c == "s":
                row.append(f"s{b}s{b}")
            else:
                row.append(f"s{b}{c}")
        s_text.append(" ".join(row))
    win_text = []
    for b in "abcdefg" + "klmnopqrst":
        row = []
        for c in "abc" + "efghijklmnopqr" + "s" + "tuvwxyz":
            if c == "s":
                row.append(f"win{b}s{b}")
            else:
                row.append(f"win{b}{c}")
        win_text.append(" ".join(row))
    return [
        {"id": 0, "text": "\n".join(s_text)},
        {"id": 1, "text": "Sun Flower sounds like the title of a painting, maybe about a plant wilting under the heat."},
        {"id": 2, "text": "Sun Flower sounds like the title of a painting, maybe about a flower wilting under the heat."},
        {"id": 3, "text": "A flower wilting under the sun, unlike a sunflower"},
        {"id": 4, "text": "sun flower wilting under the heat"},
        {"id": 5, "text": "sunflower wilting under the heat"},
        {"id": 6, "text": "this is the best meal I have ever had in such a beautiful summer day"},
        {"id": 7, "text": "this is the best cooked meal of the summer"},
        {"id": 8, "text": "this is the best meal of the summer"},
        {"id": 9, "text": "this is the best meal of summer"},
        {"id": 10, "text": "this is the best summer meal"},
        {"id": 11, "text": "summer x y best"},
        {"id": 12, "text": "summer x best"},
        {"id": 13, "text": "summer best"},
        {"id": 14, "text": "\n".join(win_text)},
        {"id": 15, "text": "this is the best meal I have ever had in such a beautiful winter day"},
        {"id": 16, "text": "this is the best cooked meal of the winter"},
        {"id": 17, "text": "this is the best meal of the winter"},
        {"id": 18, "text": "this is the best meal of winter"},
        {"id": 19, "text": "this is the best winter meal"},
        {"id": 20, "text": "winter x y best"},
        {"id": 21, "text": "winter x best"},
        {"id": 22, "text": "winter best"},
    ]


def test_proximity_simple():
    index = build_index(
        SIMPLE_DOCS, criteria=["words", "proximity"], searchable=["text"]
    )
    ids = search_ids(index, "the quick brown fox jumps over the lazy dog", strategy="all")
    assert ids == [9, 10, 4, 7, 6, 2, 3, 5, 1, 0]


def test_proximity_split_word():
    index = build_index(
        letters_docs(), criteria=["words", "proximity"], searchable=["text"]
    )
    ids = search_ids(index, "sunflower wilting", strategy="all")
    assert ids == [2, 4, 5, 1, 3]

    ids = search_ids(index, '"sun flower" wilting', strategy="all")
    assert ids == [2, 4, 1]

    index = build_index(
        letters_docs(),
        criteria=["words", "proximity"],
        searchable=["text"],
        synonyms={"xyz": ["sun flower"]},
    )
    ids = search_ids(index, "xyz wilting", strategy="all")
    assert ids == [2, 4, 1]


def test_proximity_prefix_db():
    index = build_index(
        letters_docs(), criteria=["words", "proximity"], searchable=["text"]
    )
    # "s" is in the prefix DB: loses the backward-proximity precision
    ids = search_ids(index, "best s", strategy="all")
    assert ids == [10, 9, 6, 7, 8, 11, 12, 13, 15]
    # "su" is not in the prefix DB
    ids = search_ids(index, "best su", strategy="all")
    assert ids == [10, 13, 9, 12, 6, 7, 8, 11, 15]
    # "win" is in the prefix DB
    ids = search_ids(index, "best win", strategy="all")
    assert ids == [19, 18, 15, 16, 17, 20, 21, 22]
    # "wint" is not in the prefix DB
    ids = search_ids(index, "best wint", strategy="all")
    assert ids == [19, 22, 18, 21, 15, 16, 17, 20]
    # "wi" is in the prefix DB
    ids = search_ids(index, "best wi", strategy="all")
    assert ids == [19, 18, 15, 16, 17, 20, 21, 22]
