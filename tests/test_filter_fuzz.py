"""Randomized filter + facet differentials against a brute-force oracle.

The array evaluator (bisected FacetArrays ranges, set-complement NOT) must
match a direct per-document predicate evaluation for randomized documents
and filter expressions; facet counts must match direct counting.
"""

import numpy as np
import pytest

from meilisearch_tpu.index.store import IndexStore, facet_string_normalize
from meilisearch_tpu.search.facets import facet_distribution
from meilisearch_tpu.search.filters import evaluate_filter

TAGS = ["red", "blue", "green", "Big Red", "tiny"]


def _store(seed):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(int(rng.integers(40, 160))):
        doc = {"id": i}
        if rng.random() < 0.85:
            doc["n"] = float(rng.integers(-20, 120))
        if rng.random() < 0.8:
            doc["tag"] = str(rng.choice(TAGS))
        if rng.random() < 0.15:
            doc["tag"] = None
        if rng.random() < 0.1:
            doc["tag"] = []
        docs.append(doc)
    store = IndexStore(f"ff{seed}", primary_key="id")
    store.settings.apply_json({"filterableAttributes": ["n", "tag"]})
    store.add_documents(docs)
    return store, docs


def _doc_numbers(doc, field):
    v = doc.get(field)
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return [float(v)]
    return []


def _doc_strings(doc, field):
    v = doc.get(field)
    if isinstance(v, str):
        return [facet_string_normalize(v)]
    return []


def _brute(docs, field, op, value, value2=None):
    """Direct per-document evaluation of one condition (the reference's
    value_bounds.rs semantics: string comparison always applies, numbers
    only when the value parses)."""
    out = set()
    norm = facet_string_normalize(str(value)) if value is not None else None
    try:
        num = float(value)
    except (TypeError, ValueError):
        num = None
    for doc in docs:
        i = doc["id"]
        nums = _doc_numbers(doc, field)
        strs = _doc_strings(doc, field)
        if op == "=":
            if norm in strs or (num is not None and num in nums):
                out.add(i)
        elif op == "EXISTS":
            if field in doc:
                out.add(i)
        elif op == "NULL":
            if doc.get(field) is None and field in doc:
                out.add(i)
        elif op == "EMPTY":
            if doc.get(field) == [] or doc.get(field) == {}:
                out.add(i)
        elif op == "TO":
            norm2 = facet_string_normalize(str(value2))
            try:
                num2 = float(value2)
            except (TypeError, ValueError):
                num2 = None
            if any(norm <= s <= norm2 for s in strs):
                out.add(i)
            if num is not None and num2 is not None and any(
                num <= x <= num2 for x in nums
            ):
                out.add(i)
        else:  # comparison ops
            import operator

            cmp = {">": operator.gt, ">=": operator.ge,
                   "<": operator.lt, "<=": operator.le}[op]
            if any(cmp(s, norm) for s in strs):
                out.add(i)
            if num is not None and any(cmp(x, num) for x in nums):
                out.add(i)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_filter_conditions_match_brute_force(seed):
    store, docs = _store(seed)
    rng = np.random.default_rng(seed + 99)
    all_ids = {d["id"] for d in docs}

    for _ in range(25):
        field = str(rng.choice(["n", "tag"]))
        op = str(rng.choice(["=", ">", ">=", "<", "<=", "TO", "EXISTS", "NULL", "EMPTY"]))
        value = (
            str(int(rng.integers(-30, 130)))
            if field == "n" or rng.random() < 0.3
            else str(rng.choice(TAGS))
        )
        if op == "TO":
            lo, hi = sorted(
                [int(rng.integers(-30, 130)), int(rng.integers(-30, 130))]
            )
            expr = f"{field} {lo} TO {hi}"
            expected = _brute(docs, field, "TO", str(lo), str(hi))
        elif op in ("EXISTS", "NULL", "EMPTY"):
            expr = {"EXISTS": f"{field} EXISTS", "NULL": f"{field} IS NULL",
                    "EMPTY": f"{field} IS EMPTY"}[op]
            expected = _brute(docs, field, op, None)
        else:
            quoted = f"'{value}'" if " " in value else value
            expr = f"{field} {op} {quoted}"
            expected = _brute(docs, field, op, value)

        got = set(evaluate_filter(store, expr))
        assert got == expected, f"seed {seed} expr {expr!r}"

        # NOT variant: complement against all documents
        got_not = set(evaluate_filter(store, f"NOT ({expr})"))
        assert got_not == all_ids - expected, f"seed {seed} NOT {expr!r}"


@pytest.mark.parametrize("seed", [0, 1])
def test_boolean_combinations_match_brute_force(seed):
    store, docs = _store(seed)
    a = _brute(docs, "n", ">", "50")
    b = _brute(docs, "tag", "=", "red")
    c = _brute(docs, "n", "<=", "10")
    assert set(evaluate_filter(store, "n > 50 AND tag = red")) == a & b
    assert set(evaluate_filter(store, "n > 50 OR tag = red")) == a | b
    assert set(
        evaluate_filter(store, "(n > 50 OR tag = red) AND NOT n <= 10")
    ) == (a | b) - c


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_facet_distribution_matches_brute_force(seed):
    store, docs = _store(seed)
    rng = np.random.default_rng(seed + 7)
    ids = sorted(d["id"] for d in docs)
    candidates = np.asarray(
        sorted(rng.choice(ids, size=len(ids) // 2, replace=False).tolist()),
        dtype=np.int64,
    )
    dist, _stats = facet_distribution(store, ["tag", "n"], candidates)

    expected_tag: dict = {}
    for doc in docs:
        if doc["id"] in candidates and isinstance(doc.get("tag"), str):
            key = doc["tag"]
            # distribution keys are the original form of the first-seen value
            norm = facet_string_normalize(key)
            expected_tag[norm] = expected_tag.get(norm, 0) + 1
    got_tag = {
        facet_string_normalize(k): v for k, v in dist["tag"].items()
    }
    assert got_tag == expected_tag, f"seed {seed}"
