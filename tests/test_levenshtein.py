import numpy as np

from meilisearch_tpu.ops.levenshtein import osa_distances, pack_words


def osa_ref(a: str, b: str) -> int:
    """Plain OSA (restricted Damerau-Levenshtein) reference."""
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[m][n]


def test_against_reference():
    words = [
        "quick", "quack", "quicc", "qiuck", "kuick", "quickest", "brown",
        "q", "", "uick", "quik", "xquick", "quicky", "chien", "chine",
    ]
    mat, lens = pack_words(words)
    rng = np.random.default_rng(0)
    queries = ["quick", "qick", "quikc", "chein", "brwon", "a"]
    for q in queries:
        full, prefix = osa_distances(q, mat, lens)
        for i, w in enumerate(words):
            expect = min(osa_ref(q, w), 3)
            assert full[i] == expect, (q, w, full[i], expect)
            pexpect = min(min(osa_ref(q, w[:j]) for j in range(len(w) + 1)), 3)
            assert prefix[i] == pexpect, (q, w, prefix[i], pexpect)


def test_transposition_is_one_edit():
    mat, lens = pack_words(["quick"])
    full, _ = osa_distances("quikc", mat, lens)
    assert full[0] == 1


def test_prefix_distance():
    mat, lens = pack_words(["quickest"])
    full, prefix = osa_distances("quick", mat, lens)
    assert full[0] == 3  # clipped
    assert prefix[0] == 0  # "quick" is an exact prefix
    full, prefix = osa_distances("quikc", mat, lens)
    assert prefix[0] == 1
