"""Multi-node federated search without a real cluster: a second in-process
server on a real socket acts as the remote (the reference's LocalMeili
pattern, crates/meilisearch/tests/search/multi/proxy.rs:5297)."""

import threading
from http.server import ThreadingHTTPServer

import pytest

from meilisearch_tpu.api.app import App, TestClient
from meilisearch_tpu.api.server import make_handler


@pytest.fixture
def two_nodes():
    ms0 = App()
    ms1 = App()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(ms1))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    c0 = TestClient(ms0)
    c1 = TestClient(ms1)
    c0.patch("/experimental-features", body={"network": True})
    c0.patch(
        "/network",
        body={
            "self": "ms0",
            "remotes": {"ms1": {"url": f"http://127.0.0.1:{port}"}},
        },
    )
    yield c0, c1
    server.shutdown()
    ms0.scheduler.stop()
    ms1.scheduler.stop()


def test_remote_federation(two_nodes):
    c0, c1 = two_nodes
    c0.add_documents("movies", [{"id": 1, "title": "local glass"}])
    c1.add_documents("movies", [{"id": 2, "title": "remote glass"}])

    res = c0.post(
        "/multi-search",
        body={
            "federation": {},
            "queries": [
                {"indexUid": "movies", "q": "glass"},
                {
                    "indexUid": "movies",
                    "q": "glass",
                    "federationOptions": {"remote": "ms1"},
                },
            ],
        },
    )
    assert res.status == 200, res.json
    hits = res.json["hits"]
    titles = {h["title"] for h in hits}
    assert titles == {"local glass", "remote glass"}
    remote_hit = next(h for h in hits if h["title"] == "remote glass")
    assert remote_hit["_federation"]["remote"] == "ms1"
    assert remote_hit["_federation"]["queriesPosition"] == 1


def test_unknown_remote(two_nodes):
    c0, _c1 = two_nodes
    c0.add_documents("movies", [{"id": 1, "title": "x"}])
    res = c0.post(
        "/multi-search",
        body={
            "federation": {},
            "queries": [
                {"indexUid": "movies", "q": "x",
                 "federationOptions": {"remote": "nope"}},
            ],
        },
    )
    assert res.status == 400


def test_remote_failure_is_partial(two_nodes):
    c0, c1 = two_nodes
    c0.add_documents("movies", [{"id": 1, "title": "alpha"}])
    # point the remote at a dead port
    c0.patch(
        "/network",
        body={"remotes": {"ms1": {"url": "http://127.0.0.1:9"}}},
    )
    res = c0.post(
        "/multi-search",
        body={
            "federation": {},
            "queries": [
                {"indexUid": "movies", "q": "alpha"},
                {"indexUid": "movies", "q": "alpha",
                 "federationOptions": {"remote": "ms1"}},
            ],
        },
    )
    assert res.status == 200
    assert [h["title"] for h in res.json["hits"]] == ["alpha"]
    assert "ms1" in res.json["remoteErrors"]


def test_federation_scoped_key_cannot_reach_other_indexes():
    """A key scoped to index `movies*` must not read another index through
    federation side doors: remote-proxied queries and facetsByIndex."""
    from meilisearch_tpu.api.app import App, TestClient

    app = App(master_key="MASTER_KEY")
    try:
        master = TestClient(app, api_key="MASTER_KEY")
        master.patch("/experimental-features", body={"network": True})
        master.patch(
            "/network",
            body={"self": "ms0", "remotes": {"ms1": {"url": "http://127.0.0.1:1"}}},
        )
        res = master.post(
            "/indexes/secrets/documents", body=[{"id": 1, "level": "top"}]
        )
        app.scheduler.wait_for_task(res.json["taskUid"])
        master.patch(
            "/indexes/secrets/settings", body={"filterableAttributes": ["level"]}
        )
        res = master.post(
            "/indexes/movies/documents", body=[{"id": 1, "title": "glass"}]
        )
        app.scheduler.wait_for_task(res.json["taskUid"])
        res = master.post(
            "/keys",
            body={"actions": ["search"], "indexes": ["movies*"], "expiresAt": None},
        )
        scoped = TestClient(app, api_key=res.json["key"])

        # remote-proxied query on a foreign index: rejected before any HTTP
        res = scoped.post(
            "/multi-search",
            body={
                "federation": {},
                "queries": [
                    {
                        "indexUid": "secrets",
                        "q": "",
                        "federationOptions": {"remote": "ms1"},
                    }
                ],
            },
        )
        assert res.status == 403, res.json

        # facetsByIndex on a foreign index: rejected
        res = scoped.post(
            "/multi-search",
            body={
                "federation": {"facetsByIndex": {"secrets": ["level"]}},
                "queries": [{"indexUid": "movies", "q": "glass"}],
            },
        )
        assert res.status == 403, res.json
    finally:
        app.scheduler.stop()


def test_federated_facets_scoped_to_matched_candidates():
    """facetsByIndex counts only documents matched by the federation's
    queries, not the whole index (reference federated facet merge)."""
    from meilisearch_tpu.api.app import App, TestClient

    app = App()
    try:
        client = TestClient(app)
        client.add_documents(
            "movies",
            [
                {"id": 1, "title": "glass onion", "genre": "mystery"},
                {"id": 2, "title": "glass castle", "genre": "drama"},
                {"id": 3, "title": "iron giant", "genre": "animation"},
            ],
        )
        client.update_settings("movies", {"filterableAttributes": ["genre"]})
        res = client.post(
            "/multi-search",
            body={
                "federation": {"facetsByIndex": {"movies": ["genre"]}},
                "queries": [{"indexUid": "movies", "q": "glass"}],
            },
        )
        assert res.status == 200, res.json
        dist = res.json["facetsByIndex"]["movies"]["distribution"]
        assert dist == {"genre": {"mystery": 1, "drama": 1}}, dist

        # mergeFacets folds per-index facets into one distribution
        res = client.post(
            "/multi-search",
            body={
                "federation": {
                    "facetsByIndex": {"movies": ["genre"]},
                    "mergeFacets": {},
                },
                "queries": [{"indexUid": "movies", "q": "glass"}],
            },
        )
        assert res.status == 200, res.json
        assert "facetsByIndex" not in res.json
        assert res.json["facetDistribution"] == {
            "genre": {"mystery": 1, "drama": 1}
        }
    finally:
        app.scheduler.stop()
