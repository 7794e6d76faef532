"""Shard topology: /network shards+leader, rendezvous shard_docids, and
the `_shard` filter (reference: meilisearch-types/src/network.rs:13-42,
milli sharding/enterprise_edition.rs, index_filter.rs evaluate_shard_operator)."""

import pytest

from meilisearch_tpu.api.app import App, TestClient
from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.parallel.rendezvous import rendezvous_shard
from meilisearch_tpu.search.perform import perform_search


def make_store(n=50):
    store = IndexStore("t", primary_key="id")
    store.settings.apply_json({"searchableAttributes": ["text"]})
    store.add_documents(
        [{"id": i, "text": f"common word{i % 5}"} for i in range(n)]
    )
    return store


def test_shard_docids_partition_is_total_and_disjoint():
    store = make_store()
    store.set_shard_topology(["s0", "s1", "s2"])
    owned = [store.shard_docids(s) for s in ("s0", "s1", "s2")]
    union = set().union(*owned)
    assert union == set(store.documents.keys())
    assert sum(len(o) for o in owned) == len(union)  # disjoint
    # matches the reference assignment function
    for ext, docid in store.external_to_internal.items():
        expected = rendezvous_shard(ext, ["s0", "s1", "s2"])
        assert docid in store.shard_docids(expected)


def test_shard_docids_stable_under_topology_growth():
    """Rendezvous property: adding a shard only MOVES docs to the new
    shard; docs never shuffle between existing shards."""
    store = make_store()
    store.set_shard_topology(["s0", "s1"])
    before = {s: set(store.shard_docids(s)) for s in ("s0", "s1")}
    store.set_shard_topology(["s0", "s1", "s2"])
    for s in ("s0", "s1"):
        assert set(store.shard_docids(s)) <= before[s]


def _search_ids(store, filt):
    res = perform_search(store, {"q": "", "filter": filt, "limit": 100})
    return {h["id"] for h in res["hits"]}


def test_shard_filter():
    store = make_store()
    store.set_shard_topology(["s0", "s1"])
    s0 = {store.internal_to_external[d] for d in store.shard_docids("s0")}
    s0 = {int(x) for x in s0}
    s1 = {int(store.internal_to_external[d]) for d in store.shard_docids("s1")}
    all_ids = set(range(50))

    assert _search_ids(store, '_shard = "s0"') == s0
    assert _search_ids(store, '_shard != "s0"') == all_ids - s0
    assert _search_ids(store, '_shard IN ["s0", "s1"]') == s0 | s1 == all_ids
    assert _search_ids(store, '_shard = "nope"') == set()


def test_shard_filter_without_topology_matches_nothing():
    store = make_store()
    assert _search_ids(store, '_shard = "s0"') == set()


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def test_network_route_shards_and_leader(client):
    client.patch("/experimental-features", body={"network": True})
    res = client.patch(
        "/network",
        body={
            "self": "ms0",
            "remotes": {
                "ms0": {"url": "http://localhost:1"},
                "ms1": {"url": "http://localhost:2"},
            },
            "shards": {
                "s0": {"remotes": ["ms0"]},
                "s1": {"remotes": ["ms1"]},
            },
            "leader": "ms0",
        },
    )
    assert res.status == 200, res.json
    r = res.json
    assert r["leader"] == "ms0"
    assert sorted(r["shards"]) == ["s0", "s1"]
    assert r["previousShards"] == {}
    assert "version" in r

    # resharding returns the previous shard map and bumps the version
    res2 = client.patch(
        "/network", body={"shards": {"s2": {"remotes": ["ms1"]}}}
    )
    r2 = res2.json
    assert sorted(r2["shards"]) == ["s0", "s1", "s2"]
    assert sorted(r2["previousShards"]) == ["s0", "s1"]
    assert r2["version"] != r["version"]

    # unknown remote in a shard is rejected
    res3 = client.patch(
        "/network", body={"shards": {"bad": {"remotes": ["nope"]}}}
    )
    assert res3.status == 400
    assert "unknown remotes" in res3.json["message"]

    # unknown leader rejected
    res4 = client.patch("/network", body={"leader": "nope"})
    assert res4.status == 400
    assert "Leader" in res4.json["message"]


def test_network_shards_propagate_to_indexes(client):
    client.patch("/experimental-features", body={"network": True})
    res = client.post(
        "/indexes/movies/documents",
        body=[{"id": i, "title": f"doc {i}"} for i in range(20)],
    )
    client.wait_for_task(res.json["taskUid"])
    client.patch(
        "/network",
        body={
            "self": "ms0",
            "remotes": {"ms0": {"url": "http://localhost:1"}},
            "shards": {"s0": {"remotes": ["ms0"]}, "s1": {"remotes": ["ms0"]}},
        },
    )
    res = client.post(
        "/indexes/movies/search", body={"q": "", "filter": '_shard = "s0"'}
    )
    a = {h["id"] for h in res.json["hits"]}
    res = client.post(
        "/indexes/movies/search", body={"q": "", "filter": '_shard = "s1"'}
    )
    b = {h["id"] for h in res.json["hits"]}
    assert a | b == set(range(20))
    assert not (a & b)
