"""Search-during-write safety: readers must never observe mid-batch table
mutations (regression for the soak-found race; reads hold the store lock
until copy-on-write generation snapshots land)."""

import random
import threading

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import (
    perform_facet_search,
    perform_search,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def test_concurrent_search_and_writes():
    store = IndexStore("conc", primary_key="id")
    store.settings.apply_json(
        {"filterableAttributes": ["tag", "n"], "sortableAttributes": ["n"]}
    )
    store.add_documents(
        [{"id": i, "t": "alpha beta", "tag": "x", "n": i} for i in range(50)]
    )

    errors = []
    stop = threading.Event()

    def writer():
        rng = random.Random(0)
        i = 1
        while not stop.is_set():
            docs = [
                {
                    "id": i * 20 + j,
                    "t": " ".join(rng.choices(WORDS, k=5)),
                    "tag": rng.choice(["x", "y"]),
                    "n": rng.randint(0, 99),
                }
                for j in range(20)
            ]
            try:
                store.add_documents(docs)
                if i % 5 == 0:
                    store.delete_documents([str(rng.randint(0, i * 20))])
            except Exception as err:  # pragma: no cover - the regression
                errors.append(repr(err))
            i += 1

    def searcher(seed):
        rng = random.Random(seed)
        while not stop.is_set():
            try:
                body = {"q": " ".join(rng.choices(WORDS, k=2))}
                if rng.random() < 0.5:
                    body["filter"] = f"n > {rng.randint(0, 90)}"
                if rng.random() < 0.3:
                    body["facets"] = ["tag"]
                perform_search(store, body)
                if rng.random() < 0.2:
                    perform_facet_search(
                        store, {"facetName": "tag", "facetQuery": ""}
                    )
            except Exception as err:  # pragma: no cover - the regression
                errors.append(repr(err))

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=searcher, args=(s,)) for s in range(2)
    ]
    for t in threads:
        t.start()
    import time

    time.sleep(4.0)
    stop.set()
    for t in threads:
        t.join(timeout=10)

    assert errors == []
