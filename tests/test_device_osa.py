"""Device OSA typo pass (ops/device_osa.py): the jitted whole-vocabulary
DP must agree with the numpy host oracle (ops/levenshtein.py) for every
word, and the typo-derivation integration must produce identical
derivations through either path."""

import numpy as np
import pytest

from meilisearch_tpu.ops.levenshtein import osa_distances, pack_words


@pytest.fixture(autouse=True)
def strict_device(monkeypatch):
    # CPU backend: force the device path (compiles fast on CPU)
    monkeypatch.setenv("MEILI_TPU_DEVICE_STRICT", "1")


def test_device_matches_host_oracle():
    rng = np.random.default_rng(11)
    alpha = "abcdef"
    words = sorted(
        {
            "".join(rng.choice(list(alpha), size=rng.integers(1, 14)))
            for _ in range(3000)
        }
    )
    mat, lens = pack_words(words)

    class FakeStore:
        generation = 1

    store = FakeStore()
    from meilisearch_tpu.ops.device_osa import osa_distances_device

    for q in ("ace", "fedcba", "abcdefab", "a", "abcabcabcabcabc"):
        hf, hp = osa_distances(q, mat, lens)
        df, dp = osa_distances_device(store, mat, lens, q)
        assert np.array_equal(hf, df), q
        assert np.array_equal(hp, dp), q


def test_typo_derivations_identical_via_device(monkeypatch):
    from meilisearch_tpu.index.store import IndexStore
    from meilisearch_tpu.search.query_terms import DerivationContext

    docs = [
        {"id": i, "t": w}
        for i, w in enumerate(
            ["quick", "quack", "quicc", "qiuck", "kuick", "quickest",
             "brown", "quik", "xquick", "quicky", "chien", "chine",
             "machine", "machines", "mischief"]
        )
    ]

    def derive(enable_device):
        monkeypatch.setenv(
            "MEILI_TPU_DEVICE_STRICT", "1" if enable_device else "0"
        )
        monkeypatch.setenv(
            "MEILI_TPU_DEVICE_OSA", "1" if enable_device else "0"
        )
        st = IndexStore("t")
        st.add_documents([dict(d) for d in docs])
        ctx = DerivationContext(st, st.settings)
        out = {}
        for word, prefix in (
            ("quick", False), ("quick", True), ("machin", True),
            ("mchine", False), ("quickl", False),
        ):
            t = ctx._base_term_uncached(word, 2, prefix, False)
            out[(word, prefix)] = (t.one_typo, t.two_typos)
        return out

    assert derive(True) == derive(False)
