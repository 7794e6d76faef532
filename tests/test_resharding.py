"""Live resharding (VERDICT r2 #5; reference
scheduler/enterprise_edition/network.rs:680 NetworkTopologyChange +
tasks/network.rs previousShards): a topology change moves documents to
their new owning remotes via a task with Origin metadata, and federated
shard queries dual-fan to previous owners until the window closes —
no hit lost, none duplicated, even while one instance's movement is
stalled mid-transition."""

import threading
from http.server import ThreadingHTTPServer

import pytest

from meilisearch_tpu.api.app import App, TestClient
from meilisearch_tpu.api.server import make_handler
from meilisearch_tpu.parallel.rendezvous import rendezvous_shard

N_DOCS = 40


@pytest.fixture
def cluster():
    apps = {name: App() for name in ("ms0", "ms1", "ms2")}
    servers = {}
    urls = {}
    for name, app in apps.items():
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers[name] = srv
        urls[name] = f"http://127.0.0.1:{srv.server_address[1]}"
    clients = {name: TestClient(app) for name, app in apps.items()}
    for name, c in clients.items():
        c.patch("/experimental-features", body={"network": True})
        c.patch(
            "/network",
            body={
                "self": name,
                "leader": "ms0",
                "remotes": {
                    other: {"url": urls[other]}
                    for other in apps
                    if other != name
                },
            },
        )
    yield apps, clients
    for srv in servers.values():
        srv.shutdown()
    for app in apps.values():
        app.scheduler.stop()


def shard_query_all(client, shards):
    res = client.post(
        "/multi-search",
        body={
            "federation": {"limit": 1000},
            "queries": [
                {
                    "indexUid": "movies",
                    "q": "",
                    "federationOptions": {"shard": s},
                }
                for s in shards
            ],
        },
    )
    assert res.status == 200, res.json
    ids = [h["id"] for h in res.json["hits"]]
    return ids


def test_reshard_moves_documents_no_loss_no_dupes(cluster):
    apps, clients = cluster
    old_shards = {"s0": {"remotes": ["ms0"]}, "s1": {"remotes": ["ms1"]}}
    for c in clients.values():
        c.patch("/network", body={"shards": old_shards})
    for app in apps.values():
        app.scheduler.wait_for_all_tasks()

    # distribute documents to their rendezvous owners
    docs_by_owner = {"ms0": [], "ms1": []}
    old_topo = sorted(old_shards)
    for i in range(N_DOCS):
        shard = rendezvous_shard(str(i), old_topo)
        owner = old_shards[shard]["remotes"][0]
        docs_by_owner[owner].append({"id": i, "title": f"doc number {i}"})
    for owner, docs in docs_by_owner.items():
        clients[owner].add_documents("movies", docs)
    for app in apps.values():
        app.scheduler.wait_for_all_tasks()

    ids = shard_query_all(clients["ms0"], ["s0", "s1"])
    assert sorted(ids) == list(range(N_DOCS))
    assert len(ids) == len(set(ids))

    # -- reshard: add s2 owned by ms2; STALL ms1's movement mid-transition
    release_ms1 = threading.Event()

    def blocking_hook(stage):
        if stage == "batch_created":
            release_ms1.wait(timeout=30)

    apps["ms1"].scheduler.breakpoint_hook = blocking_hook

    new_shards = dict(old_shards)
    new_shards["s2"] = {"remotes": ["ms2"]}
    for name in ("ms0", "ms1", "ms2"):
        out = clients[name].patch("/network", body={"shards": new_shards})
        assert out.status == 200, out.json
        assert out.json.get("previousShards") == old_shards
    apps["ms0"].scheduler.wait_for_all_tasks()
    apps["ms2"].scheduler.wait_for_all_tasks()

    new_topo = sorted(new_shards)
    moving = [
        i for i in range(N_DOCS)
        if rendezvous_shard(str(i), new_topo) == "s2"
    ]
    assert moving, "test corpus must exercise movement"

    # mid-transition: ms0's docs moved to ms2, ms1's are stuck (stalled) —
    # the dual-query window must still find every document exactly once
    ids = shard_query_all(clients["ms0"], ["s0", "s1", "s2"])
    assert sorted(ids) == list(range(N_DOCS)), "lost hits mid-reshard"
    assert len(ids) == len(set(ids)), "duplicated hits mid-reshard"

    # movement provenance (reference tasks/network.rs Origin)
    ms2_tasks = clients["ms2"].get("/tasks").json["results"]
    origins = [
        t.get("network") for t in ms2_tasks
        if t["type"] == "documentAdditionOrUpdate" and t.get("network")
    ]
    assert any(
        (o or {}).get("origin", {}).get("remote") == "ms0" for o in origins
    )

    # -- release ms1, finish the cluster move, close the window (leader)
    release_ms1.set()
    apps["ms1"].scheduler.breakpoint_hook = None
    apps["ms1"].scheduler.wait_for_all_tasks()
    for name in ("ms0", "ms1", "ms2"):
        clients[name].patch("/network", body={"previousShards": None})
        assert "previousShards" not in apps[name].scheduler.network

    ids = shard_query_all(clients["ms0"], ["s0", "s1", "s2"])
    assert sorted(ids) == list(range(N_DOCS))
    assert len(ids) == len(set(ids))

    # steady state: documents physically live at their new owners only
    ms2_store = apps["ms2"].scheduler.index("movies")
    assert sorted(
        d["id"] for d in ms2_store.documents.values()
    ) == sorted(moving)
    for name in ("ms0", "ms1"):
        store = apps[name].scheduler.index("movies")
        held = {d["id"] for d in store.documents.values()}
        assert not (held & set(moving)), f"{name} kept moved documents"
