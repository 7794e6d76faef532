"""Golden-test helpers.

These suites are ports of the reference's relevance tests
(/root/reference/crates/milli/src/search/new/tests/) with the exact same
documents, queries, and expected ranked docid lists — they pin ranking parity.
"""

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.executor import Search


def build_index(docs, criteria=None, searchable=None, **settings_json):
    store = IndexStore("test")
    patch = dict(settings_json)
    if criteria is not None:
        patch["rankingRules"] = criteria
    if searchable is not None:
        patch["searchableAttributes"] = searchable
    patch.setdefault("primaryKey", None)
    patch.pop("primaryKey")
    store.settings.apply_json(patch)
    store.primary_key = "id"
    store.add_documents(docs)
    return store


def search_ids(store, query, strategy="last", **kwargs):
    s = Search(
        store,
        query=query,
        terms_matching_strategy=strategy,
        limit=kwargs.pop("limit", 20),
        **kwargs,
    )
    res = s.execute()
    return res.documents_ids
