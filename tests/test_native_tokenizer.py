"""Differential test: native C++ tokenizer vs the Python reference path."""

import random
import string

import pytest

from meilisearch_tpu.analysis.native import _load, native_indexed_words
from meilisearch_tpu.analysis.tokenizer import Tokenizer


def python_path(text, stop_words=frozenset()):
    t = Tokenizer(stop_words=stop_words)
    # bypass the native fast path
    out = []
    position = 0
    from meilisearch_tpu.analysis.tokenizer import (
        HARD_SEPARATOR_GAP,
        MAX_WORD_LENGTH,
        TokenKind,
    )

    prev = None
    for token in t.tokenize(text):
        if token.is_word() and token.lemma:
            if prev is None:
                pass
            elif prev is TokenKind.SEPARATOR_HARD:
                position += HARD_SEPARATOR_GAP
            else:
                position += 1
            prev = token.kind
            word = token.lemma.strip()
            if (
                token.kind is TokenKind.WORD
                and word
                and len(word.encode("utf-8")) <= MAX_WORD_LENGTH
            ):
                out.append((word, position))
        elif token.kind is TokenKind.SEPARATOR_HARD:
            if prev is not None:
                prev = TokenKind.SEPARATOR_HARD
        elif token.kind is TokenKind.SEPARATOR_SOFT:
            if prev is not None and prev is not TokenKind.SEPARATOR_HARD:
                prev = TokenKind.SEPARATOR_SOFT
    return out


needs_native = pytest.mark.skipif(_load() is None, reason="native lib unavailable")


@needs_native
def test_simple_parity():
    cases = [
        "the quick brown fox",
        "Hello, World! This. is; a (test)",
        "  leading spaces and trailing  ",
        "... leading hard",
        "CamelCase MIXED123 numbers42",
        "hyphen-ated under_score",
        "a|b{c}d[e]f",
        "Café déjà-vu naïve Ångström",
        "",
        "!!!",
        "one",
    ]
    for text in cases:
        native = native_indexed_words(text, frozenset())
        assert native is not None, text
        assert native == python_path(text), text
    # ligatures/uncomposable letters force the Python fallback
    # (NFKD keeps Œ and ß as-is, so the fold is not pure ASCII)
    assert native_indexed_words("Œuvre ßharp", frozenset()) is None


@needs_native
def test_stop_words_parity():
    sw = frozenset({"the", "To", "xyz"})
    for text in ["the quick To brown xyz fox the", "To the!"]:
        assert native_indexed_words(text, sw) == python_path(text, sw)


@needs_native
def test_non_latin_falls_back():
    assert native_indexed_words("東京 kyoto", frozenset()) is None
    assert native_indexed_words("русский текст", frozenset()) is None


@needs_native
def test_fuzz_parity():
    rng = random.Random(1234)
    alphabet = string.ascii_letters + string.digits + " .,;!?()-_'\"|éàüñÉçøåŁ"
    for _ in range(300):
        n = rng.randint(0, 60)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        native = native_indexed_words(text, frozenset())
        if native is None:
            continue  # fallback is always allowed
        assert native == python_path(text), repr(text)
