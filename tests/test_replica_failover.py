"""Shard-replica failover: a shard whose remotes list several replicas
serves from ONE available replica, and a dead replica fails over to the
next instead of losing the shard (reference replication analogue:
network.rs leader/remotes + RemoteAvailability backoff)."""

import threading
from http.server import ThreadingHTTPServer

import pytest

from meilisearch_tpu.api.app import App, TestClient
from meilisearch_tpu.api.server import make_handler
from meilisearch_tpu.api import federation as fed_mod


@pytest.fixture
def cluster():
    """ms0 (router) + ms1/ms2 (replicas of shard s1, same documents)."""
    ms0, ms1, ms2 = App(), App(), App()
    servers = []
    ports = []
    for app in (ms1, ms2):
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
        ports.append(srv.server_address[1])
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
    c0, c1, c2 = TestClient(ms0), TestClient(ms1), TestClient(ms2)
    c0.patch("/experimental-features", body={"network": True})
    c0.patch(
        "/network",
        body={
            "self": "ms0",
            "remotes": {
                "ms1": {"url": f"http://127.0.0.1:{ports[0]}"},
                "ms2": {"url": f"http://127.0.0.1:{ports[1]}"},
            },
        },
    )
    # one shard, two replicas; replicas hold identical documents
    c0.patch(
        "/network",
        body={"shards": {"s1": {"remotes": ["ms1", "ms2"]}}},
    )
    docs = [
        {"id": 1, "title": "alpha shard doc"},
        {"id": 2, "title": "beta shard doc"},
    ]
    for name, c in (("ms1", c1), ("ms2", c2)):
        # replicas share the topology: one shard owning every document
        c.patch("/experimental-features", body={"network": True})
        c.patch(
            "/network",
            body={
                "self": name,
                "remotes": {
                    "ms1": {"url": f"http://127.0.0.1:{ports[0]}"},
                    "ms2": {"url": f"http://127.0.0.1:{ports[1]}"},
                },
            },
        )
        c.patch(
            "/network",
            body={"shards": {"s1": {"remotes": ["ms1", "ms2"]}}},
        )
        c.add_documents("movies", docs)
    yield c0, servers, ports
    for srv in servers:
        srv.shutdown()
    for app in (ms0, ms1, ms2):
        app.scheduler.stop()


def _shard_query():
    return {
        "federation": {},
        "queries": [
            {
                "indexUid": "movies",
                "q": "shard",
                "federationOptions": {"shard": "s1"},
            }
        ],
    }


def test_single_replica_serves_and_no_duplicates(cluster):
    c0, _servers, _ports = cluster
    res = c0.post("/multi-search", body=_shard_query())
    assert res.status == 200
    ids = [h["id"] for h in res.json["hits"]]
    # ONE replica answered: no duplicate hits from fanning to both
    assert sorted(ids) == [1, 2]
    assert not res.json.get("remoteErrors")


def test_dead_replica_fails_over(cluster):
    c0, servers, _ports = cluster
    # fresh backoff state: other tests may have poisoned these URLs
    fed_mod.REMOTE_AVAILABILITY._state.clear()
    # kill ms1 (the lexicographically-first replica the router prefers)
    servers[0].shutdown()
    res = c0.post("/multi-search", body=_shard_query())
    assert res.status == 200
    ids = sorted(h["id"] for h in res.json["hits"])
    # the shard still serves completely via ms2
    assert ids == [1, 2], res.json
    # the dead replica's failure is not surfaced as a loss
    assert not res.json.get("remoteErrors"), res.json.get("remoteErrors")
