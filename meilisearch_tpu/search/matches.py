"""Highlighting, crop, and match positions.

Reference: milli/src/search/new/matches/ —
  - MatchingWords (matching_words.rs): token vs derivation matching; prefix
    terms highlight only the typed prefix length (original_char_count);
    phrases/split-words/synonyms match runs of consecutive tokens
  - Matcher (mod.rs): `_formatted` highlight tags, crop around the best
    match interval, `_matchesPosition` byte ranges
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..analysis.tokenizer import Token, Tokenizer
from .query_terms import LocatedQueryTerm


@dataclass
class WordMatcher:
    words: set[str]
    is_prefix: bool
    original_char_count: int
    term_id_start: int
    term_id_end: int


@dataclass
class PhraseMatcher:
    words: tuple  # Optional[str] sequence
    term_id_start: int
    term_id_end: int


class MatchingWords:
    def __init__(self, located_terms: list[LocatedQueryTerm]):
        self.word_matchers: list[WordMatcher] = []
        self.phrase_matchers: list[PhraseMatcher] = []
        for lt in located_terms:
            term = lt.term
            words: set[str] = set()
            for cls in (0, 1, 2):
                words.update(term.words_for_class(cls))
                for p in term.phrases_for_class(cls):
                    self.phrase_matchers.append(
                        PhraseMatcher(tuple(p), lt.start_term_id, lt.end_term_id)
                    )
            if term.use_prefix_db:
                words.add(term.use_prefix_db)
            if words:
                self.word_matchers.append(
                    WordMatcher(
                        words,
                        term.is_prefix,
                        len(term.original),
                        lt.start_term_id,
                        lt.end_term_id,
                    )
                )
        # prefixes at the bottom, prioritizing exact matches
        # (matching_words.rs:60)
        self.word_matchers.sort(key=lambda m: (m.is_prefix, -(m.term_id_end - m.term_id_start + 1)))

    def match_word_token(self, token: Token) -> Optional[tuple[int, int, int]]:
        """Returns (highlight_char_len, id_start, id_end) or None."""
        lemma = token.lemma
        for m in self.word_matchers:
            for word in m.words:
                if m.is_prefix and lemma.startswith(word):
                    # highlight only the typed prefix length
                    prefix_chars = min(len(word), m.original_char_count)
                    # at least the typed chars, at most the token
                    return (min(prefix_chars, len(lemma)), m.term_id_start, m.term_id_end)
                if lemma == word:
                    return (len(lemma), m.term_id_start, m.term_id_end)
        return None


@dataclass
class TokenMatch:
    token_index: int  # index in the word-token list
    char_start: int  # char offsets in the original text
    char_end: int
    highlight_chars: int  # how many chars of the token to highlight
    id_start: int
    id_end: int


class Matcher:
    def __init__(
        self,
        matching_words: MatchingWords,
        tokenizer: Tokenizer,
        text: str,
    ):
        self.text = text
        self.mw = matching_words
        self.tokens = tokenizer.tokenize(text)
        self.word_tokens = [
            (i, t) for i, t in enumerate(self.tokens) if t.is_word()
        ]
        self.matches = self._compute_matches()

    def _compute_matches(self) -> list[TokenMatch]:
        out: list[TokenMatch] = []
        wt = self.word_tokens
        consumed_until = -1
        for wi, (ti, token) in enumerate(wt):
            # phrases first (reference MatchesIter order)
            matched_phrase = False
            for pm in self.mw.phrase_matchers:
                pwords = [w for w in pm.words]
                if not pwords:
                    continue
                # try matching the phrase starting at wi
                ok = True
                offsets = []
                for j, pw in enumerate(pwords):
                    if wi + j >= len(wt):
                        ok = False
                        break
                    if pw is None:
                        offsets.append(wi + j)
                        continue
                    if wt[wi + j][1].lemma != pw:
                        ok = False
                        break
                    offsets.append(wi + j)
                if ok and offsets:
                    for j in offsets:
                        tok = wt[j][1]
                        out.append(
                            TokenMatch(
                                j,
                                tok.char_start,
                                tok.char_end,
                                tok.char_end - tok.char_start,
                                pm.term_id_start,
                                pm.term_id_end,
                            )
                        )
                    consumed_until = offsets[-1]
                    matched_phrase = True
                    break
            if matched_phrase or wi <= consumed_until:
                continue
            m = self.mw.match_word_token(token)
            if m is not None:
                hl, ids, ide = m
                out.append(
                    TokenMatch(
                        wi, token.char_start, token.char_end, hl, ids, ide
                    )
                )
        return out

    # -- crop & format --------------------------------------------------------

    def _best_interval(self, crop_size: int) -> tuple[int, int]:
        """Find the window of matches to crop around (reference
        best_match_interval.rs: maximize distinct query word ids within a
        crop_size-words window)."""
        matches = self.matches
        if not matches:
            return (0, 0)
        best = (0, 0)
        best_score = -1
        for i in range(len(matches)):
            ids = set()
            last = i
            for j in range(i, len(matches)):
                if matches[j].token_index - matches[i].token_index >= crop_size:
                    break
                ids.update(range(matches[j].id_start, matches[j].id_end + 1))
                last = j
            score = len(ids)
            if score > best_score:
                best_score = score
                best = (i, last)
        return best

    def _crop_bounds(self, crop_size: int) -> tuple[int, int]:
        """Returns (char_start, char_end) of the crop window.

        Reference matches/mod.rs:crop_bounds — the window covers crop_size
        words, with the remaining budget split around the best match interval.
        """
        wt = self.word_tokens
        n_words = len(wt)
        if n_words == 0:
            return (0, min(len(self.text), crop_size))
        if not self.matches:
            # crop the beginning
            last = min(crop_size, n_words) - 1
            end_tok = wt[last][1]
            return (0, end_tok.char_end)
        fi, li = self._best_interval(crop_size)
        first = self.matches[fi].token_index
        last = self.matches[li].token_index
        interval_len = last - first + 1
        budget = max(crop_size - interval_len, 0)
        # the extra word of an odd budget goes before the match
        # (reference matches/mod.rs crop_bounds: "…Petit <em>Prince</em>")
        after = budget // 2
        before = budget - after
        start = first - before
        end = last + after
        if start < 0:
            end = min(end - start, n_words - 1)
            start = 0
        if end > n_words - 1:
            start = max(0, start - (end - (n_words - 1)))
            end = n_words - 1
        start_char = wt[start][1].char_start
        end_char = wt[end][1].char_end
        return (start_char, end_char)

    def format(
        self,
        highlight: bool = False,
        crop: Optional[int] = None,
        pre_tag: str = "<em>",
        post_tag: str = "</em>",
        crop_marker: str = "…",
    ) -> str:
        text = self.text
        start_char, end_char = 0, len(text)
        if crop is not None and crop > 0:
            start_char, end_char = self._crop_bounds(crop)
        parts: list[str] = []
        if start_char > 0:
            parts.append(crop_marker)
        cursor = start_char
        if highlight:
            for m in self.matches:
                if m.char_end <= start_char or m.char_start >= end_char:
                    continue
                ms = max(m.char_start, start_char)
                if ms > cursor:
                    parts.append(text[cursor:ms])
                # highlight only highlight_chars characters of the token
                hl_end = min(m.char_start + m.highlight_chars, end_char, m.char_end)
                if hl_end > ms:
                    parts.append(pre_tag + text[ms:hl_end] + post_tag)
                tail_end = min(m.char_end, end_char)
                if tail_end > hl_end:
                    parts.append(text[hl_end:tail_end])
                cursor = max(cursor, tail_end)
        if cursor < end_char:
            parts.append(text[cursor:end_char])
        if end_char < len(text):
            parts.append(crop_marker)
        return "".join(parts)

    def matches_position(self) -> list[dict]:
        """_matchesPosition entries: byte offsets into the original text."""
        out = []
        for m in self.matches:
            prefix = self.text[: m.char_start].encode("utf-8")
            matched = self.text[m.char_start : m.char_start + m.highlight_chars].encode("utf-8")
            out.append({"start": len(prefix), "length": len(matched)})
        return out
