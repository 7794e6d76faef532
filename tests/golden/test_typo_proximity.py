"""Ports of reference tests/typo_proximity.rs and tests/proximity_typo.rs —
rule-interaction traps."""

from .common import build_index, search_ids

TYPO_PROX_DOCS = [
    {"id": 0, "text": "beautigul summer. beautiful x y z summer"},
    {"id": 1, "text": "beautiful summer"},
    {"id": 2, "text": "beautigul sommer. beautigul x summer"},
    {"id": 3, "text": "beautiful sommer"},
    {"id": 4, "text": "delicitous. sweet. dessert. delicitous sweet desgert"},
    {"id": 5, "text": "delicious. sweet desgert. delicious sweet desgert"},
]


def test_trap_basic_and_complex1():
    index = build_index(
        TYPO_PROX_DOCS,
        criteria=["words", "typo", "proximity"],
        searchable=["text"],
    )
    assert search_ids(index, "beautiful summer", strategy="all") == [1, 0, 3, 2]


def test_trap_complex2():
    index = build_index(
        TYPO_PROX_DOCS,
        criteria=["words", "typo", "proximity"],
        searchable=["text"],
    )
    assert search_ids(index, "delicious sweet dessert", strategy="all") == [5, 4]


PROX_TYPO_DOCS = [
    {"id": 0, "text": "summer. holiday. sommer holidty"},
    {"id": 1, "text": "summer. holiday. sommer holiday"},
]


def test_trap_basic():
    # proximity BEFORE typo: proximity does not restrict the term subsets,
    # so the typo rule still sees the full derivations (reference notes this
    # ordering is "incorrect" but it is the pinned behavior)
    index = build_index(
        PROX_TYPO_DOCS,
        criteria=["words", "proximity", "typo"],
        searchable=["text"],
    )
    assert search_ids(index, "summer holiday", strategy="all") == [0, 1]
