"""Golden port of the reference matcher suite
(crates/milli/src/search/new/matches/mod_test.rs): highlight / crop /
best-match-interval semantics pinned against the insta snapshots, over
the same 3-document corpus (matching_words.rs:246
temp_index_with_documents) and the same query/text pairs."""

import pytest

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.matches import Matcher, MatchingWords
from meilisearch_tpu.search.query_terms import (
    DerivationContext,
    located_query_terms_from_tokens,
)


@pytest.fixture(scope="module")
def store():
    s = IndexStore("matches", primary_key="id")
    s.add_documents(
        [
            {"id": 1, "name": "split this world westfali westfalia the Ŵôřlḑôle"},
            {"id": 2, "name": "Westfália"},
            {"id": 3, "name": "Ŵôřlḑôle"},
        ]
    )
    return s


def fmt(store, query, text, highlight=False, crop=None,
        pre="<em>", post="</em>"):
    from meilisearch_tpu.search.graph import QueryGraph

    tokenizer = store.make_tokenizer(None)
    ctx = DerivationContext(store, store.settings)
    extracted = located_query_terms_from_tokens(ctx, tokenizer, query)
    terms = list(extracted.query_terms)
    QueryGraph.from_terms(ctx, terms)  # assigns the term-id ranges
    mw = MatchingWords(terms)
    return Matcher(mw, tokenizer, text).format(
        highlight=highlight, crop=crop, pre_tag=pre, post_tag=post
    )


# -- format_identity (mod_test.rs:71) ---------------------------------------

IDENTITY_TEXTS = [
    "A quick brown fox can not jump 32 feet, right? Brr, it is cold!",
    "Natalie risk her future to build a world with the boy she loves."
    " Emily Henry: The Love That Split The World.",
    "Natalie risk her future to build a world with the boy she loves.",
]


@pytest.mark.parametrize("text", IDENTITY_TEXTS)
def test_format_identity(store, text):
    assert fmt(store, "split the world", text) == text


# -- format_highlight (mod_test.rs:98) --------------------------------------

HIGHLIGHT_CASES = [
    ("", ""),
    (":-)", ":-)"),
    (
        "A quick brown fox can not jump 32 feet, right? Brr, it is cold!",
        "A quick brown fox can not jump 32 feet, right? Brr, it is cold!",
    ),
    (
        "Natalie risk her future to build a world with the boy she loves."
        " Emily Henry: The Love That Split The World.",
        "Natalie risk her future to build a <em>world</em> with <em>the</em>"
        " boy she loves. Emily Henry: <em>The</em> Love That <em>Split</em>"
        " <em>The</em> <em>World</em>.",
    ),
    (
        "Natalie risk her future to build a world with the boy she loves.",
        "Natalie risk her future to build a <em>world</em> with <em>the</em>"
        " boy she loves.",
    ),
]


@pytest.mark.parametrize("text,expected", HIGHLIGHT_CASES)
def test_format_highlight(store, text, expected):
    assert fmt(store, "split the world", text, highlight=True) == expected


# -- highlight_unicode (mod_test.rs:141) ------------------------------------

UNICODE_CASES = [
    ("world", "Ŵôřlḑôle", "<em>Ŵôřlḑ</em>ôle"),
    ("world", "Ŵôřlḑ", "<em>Ŵôřlḑ</em>"),
    ("westfali", "Westfália", "<em>Westfáli</em>a"),
]


@pytest.mark.parametrize("query,text,expected", UNICODE_CASES)
def test_highlight_unicode(store, query, text, expected):
    assert fmt(store, query, text, highlight=True) == expected


# -- format_crop (mod_test.rs:179) ------------------------------------------

CROP_CASES = [
    ("", ""),
    (":-)", ":-)"),
    (
        "A quick brown fox can not jump 32 feet, right? Brr, it is cold!",
        "A quick brown fox can not jump 32 feet, right…",
    ),
    (
        "(A quick brown fox can not jump 32 feet, right? Brr, it is cold!)",
        "(A quick brown fox can not jump 32 feet, right…",
    ),
    (
        "Natalie risk her future. Split The World is a book written by"
        " Emily Henry. I never read it.",
        "…Split The World is a book written by Emily Henry…",
    ),
    (
        "Natalie risk her future to build a world with the boy she loves.",
        "…future to build a world with the boy she loves…",
    ),
    (
        "Natalie risk her future to build a world with the boy she loves."
        " Emily Henry: The Love That Split The World.",
        "…she loves. Emily Henry: The Love That Split The World.",
    ),
    (
        "The world split void void void void void void void void void"
        " split the world void void",
        "…void void void void void split the world void void",
    ),
    (
        "split void the void void world void void void void void void"
        " void void void void split the world void void",
        "…void void void void void split the world void void",
    ),
    (
        "split split split split split split void void void void void"
        " void void void void void split the world void void",
        "…void void void void void split the world void void",
    ),
]


@pytest.mark.parametrize("text,expected", CROP_CASES)
def test_format_crop(store, text, expected):
    assert fmt(store, "split the world", text, crop=10) == expected


# -- format_highlight_crop (mod_test.rs:277) ---------------------------------

HL_CROP_CASES = [
    ("", ""),
    (":-)", ":-)"),
    (
        "A quick brown fox can not jump 32 feet, right? Brr, it is cold!",
        "A quick brown fox can not jump 32 feet, right…",
    ),
    (
        "Natalie risk her future to build a world with the boy she loves.",
        "…future to build a <em>world</em> with <em>the</em> boy she loves…",
    ),
    (
        "Natalie risk her future to build a world with the boy she loves."
        " Emily Henry: The Love That Split The World.",
        "…she loves. Emily Henry: <em>The</em> Love That <em>Split</em>"
        " <em>The</em> <em>World</em>.",
    ),
    (
        "The world split void void void void void void void void void"
        " split the world void void",
        "…void void void void void <em>split</em> <em>the</em>"
        " <em>world</em> void void",
    ),
]


@pytest.mark.parametrize("text,expected", HL_CROP_CASES)
def test_format_highlight_crop(store, text, expected):
    assert (
        fmt(store, "split the world", text, highlight=True, crop=10)
        == expected
    )


# -- format_highlight_crop_phrase_query (mod_test.rs:339) --------------------

PHRASE_TEXT = (
    "The groundbreaking invention had the power to split the world between"
    " those who embraced progress and those who resisted change!"
)

PHRASE_CASES = [
    (
        '"the world"',
        "…the power to split <em>the world</em> between those who embraced…",
    ),
    (
        'those "and those"',
        "…world between <em>those</em> who embraced progress"
        " <em>and those</em> who resisted…",
    ),
    (
        '"The groundbreaking invention had the power to split the world"',
        "<em>The groundbreaking invention had the power to split the"
        " world</em>…",
    ),
    (
        '"The groundbreaking invention had the power to split the world'
        ' between those"',
        "<em>The groundbreaking invention had the power to split the"
        " world</em>…",
    ),
    (
        '"The groundbreaking invention" "embraced progress and those who'
        ' resisted change!"',
        "…between those who <em>embraced progress and those who resisted"
        " change</em>…",
    ),
    (
        '"groundbreaking invention" "split the world between"',
        "…<em>groundbreaking invention</em> had the power to <em>split the"
        " world between</em>…",
    ),
    (
        '"groundbreaking invention" "had the power to split the world'
        ' between those"',
        "…<em>invention</em> <em>had the power to split the world between"
        " those</em>…",
    ),
]


@pytest.fixture(scope="module")
def phrase_store():
    s = IndexStore("phrases", primary_key="id")
    s.add_documents([{"id": 1, "text": PHRASE_TEXT}])
    return s


@pytest.mark.parametrize("query,expected", PHRASE_CASES)
def test_format_highlight_crop_phrase_query(phrase_store, query, expected):
    assert (
        fmt(phrase_store, query, PHRASE_TEXT, highlight=True, crop=10)
        == expected
    )


# -- smaller_crop_size (mod_test.rs:428) -------------------------------------

SMALL_CROP_CASES = [
    (2, "…split the…"),
    (1, "…split…"),
    (0, "void void split the world void void."),
]


@pytest.mark.parametrize("crop,expected", SMALL_CROP_CASES)
def test_smaller_crop_size(store, crop, expected):
    text = "void void split the world void void."
    assert fmt(store, "split the world", text, crop=crop) == expected


# -- partial_matches (mod_test.rs:465) ---------------------------------------

def test_partial_matches(store):
    text = "the do or die can't be he do and or isn't he"
    out = fmt(
        store,
        'the "t he" door "do or"',
        text,
        highlight=True,
        pre="_",
        post="_",
    )
    assert out == "_the_ _do or_ die can't be he do and or isn'_t he_"
