"""HTTP integration tests through the in-process app (the reference's
actix init_service pattern, crates/meilisearch/tests/)."""

import pytest

from meilisearch_tpu.api.app import App, TestClient


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def test_health_and_version(client):
    assert client.get("/health").json == {"status": "available"}
    res = client.get("/version")
    assert res.status == 200
    assert "pkgVersion" in res.json


def test_index_lifecycle(client):
    res = client.post("/indexes", body={"uid": "movies", "primaryKey": "id"})
    assert res.status == 202
    client.wait_for_task(res.json["taskUid"])

    res = client.get("/indexes/movies")
    assert res.status == 200
    assert res.json["uid"] == "movies"
    assert res.json["primaryKey"] == "id"

    res = client.get("/indexes")
    assert res.json["total"] == 1

    # duplicate creation fails as a task error
    res = client.post("/indexes", body={"uid": "movies"})
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "failed"
    assert task["error"]["code"] == "index_already_exists"

    res = client.delete("/indexes/movies")
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    assert client.get("/indexes/movies").status == 404


def test_documents_crud_and_search(client):
    docs = [
        {"id": 1, "title": "Carol", "genre": "Romance"},
        {"id": 2, "title": "Wonder Woman", "genre": "Action"},
        {"id": 3, "title": "Life of Pi", "genre": "Adventure"},
    ]
    task = client.add_documents("movies", docs)
    assert task["status"] == "succeeded"
    assert task["details"]["indexedDocuments"] == 3

    res = client.get("/indexes/movies/documents")
    assert res.json["total"] == 3

    res = client.get("/indexes/movies/documents/2")
    assert res.json["title"] == "Wonder Woman"

    res = client.get("/indexes/movies/documents/99")
    assert res.status == 404

    res = client.search("movies", {"q": "woman"})
    assert [h["title"] for h in res.json["hits"]] == ["Wonder Woman"]

    # GET search
    res = client.get("/indexes/movies/search?q=carol")
    assert [h["title"] for h in res.json["hits"]] == ["Carol"]

    # delete one
    res = client.delete("/indexes/movies/documents/1")
    client.wait_for_task(res.json["taskUid"])
    assert client.get("/indexes/movies/documents").json["total"] == 2

    # delete all
    res = client.delete("/indexes/movies/documents")
    client.wait_for_task(res.json["taskUid"])
    assert client.get("/indexes/movies/documents").json["total"] == 0


def test_delete_by_filter(client):
    client.add_documents(
        "movies",
        [
            {"id": 1, "genre": "a"},
            {"id": 2, "genre": "b"},
            {"id": 3, "genre": "a"},
        ],
    )
    client.update_settings("movies", {"filterableAttributes": ["genre"]})
    res = client.post(
        "/indexes/movies/documents/delete", body={"filter": "genre = a"}
    )
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    assert task["details"]["deletedDocuments"] == 2


def test_settings_routes(client):
    client.add_documents("movies", [{"id": 1, "title": "x"}])
    res = client.get("/indexes/movies/settings")
    assert res.json["rankingRules"][0] == "words"
    assert res.json["searchableAttributes"] == ["*"]

    task = client.update_settings(
        "movies", {"searchableAttributes": ["title"], "stopWords": ["the"]}
    )
    assert task["status"] == "succeeded"
    res = client.get("/indexes/movies/settings/searchable-attributes")
    assert res.json == ["title"]
    res = client.get("/indexes/movies/settings/stop-words")
    assert res.json == ["the"]

    # sub-route PUT + DELETE
    res = client.put(
        "/indexes/movies/settings/displayed-attributes", body=["title"]
    )
    client.wait_for_task(res.json["taskUid"])
    assert client.get(
        "/indexes/movies/settings/displayed-attributes"
    ).json == ["title"]
    res = client.delete("/indexes/movies/settings/displayed-attributes")
    client.wait_for_task(res.json["taskUid"])
    assert client.get(
        "/indexes/movies/settings/displayed-attributes"
    ).json == ["*"]

    # invalid setting key
    res = client.patch("/indexes/movies/settings", body={"nope": 1})
    assert res.status == 400


def test_tasks_routes(client):
    client.add_documents("a", [{"id": 1}])
    client.add_documents("b", [{"id": 1}])
    res = client.get("/tasks")
    assert res.json["total"] >= 2
    res = client.get("/tasks?indexUids=a")
    assert all(t["indexUid"] == "a" for t in res.json["results"])
    res = client.get("/tasks?statuses=succeeded")
    assert all(t["status"] == "succeeded" for t in res.json["results"])
    uid = res.json["results"][0]["uid"]
    res = client.get(f"/tasks/{uid}")
    assert res.json["uid"] == uid
    res = client.get("/tasks/99999")
    assert res.status == 404
    # batches exist
    res = client.get("/batches")
    assert res.json["total"] >= 1


def test_swap_indexes(client):
    client.add_documents("a", [{"id": 1, "title": "doc-a"}])
    client.add_documents("b", [{"id": 1, "title": "doc-b"}])
    res = client.post("/swap-indexes", body=[{"indexes": ["a", "b"]}])
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    assert (
        client.get("/indexes/a/documents/1").json["title"] == "doc-b"
    )
    assert (
        client.get("/indexes/b/documents/1").json["title"] == "doc-a"
    )


def test_task_cancelation_and_deletion(client):
    client.add_documents("a", [{"id": 1}])
    res = client.post("/tasks/cancel?statuses=enqueued,processing")
    assert res.status == 200
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    res = client.delete("/tasks?statuses=succeeded")
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    assert task["details"]["deletedTasks"] >= 1
    # missing filters is an error
    assert client.post("/tasks/cancel").status == 400


def test_stats(client):
    client.add_documents("movies", [{"id": 1, "title": "x"}])
    res = client.get("/stats")
    assert res.json["indexes"]["movies"]["numberOfDocuments"] == 1
    res = client.get("/indexes/movies/stats")
    assert res.json["numberOfDocuments"] == 1
    assert res.json["fieldDistribution"] == {"id": 1, "title": 1}


def test_experimental_features(client):
    res = client.get("/experimental-features")
    assert res.status == 200
    assert res.json["metrics"] is False
    res = client.patch("/experimental-features", body={"metrics": True})
    assert res.json["metrics"] is True
    res = client.get("/metrics")
    assert res.status == 200
    assert b"meilisearch_index_count" in res.body


def test_multi_search(client):
    client.add_documents("movies", [{"id": 1, "title": "Glass"}])
    client.add_documents("books", [{"id": 1, "title": "Glass Castle"}])
    res = client.post(
        "/multi-search",
        body={
            "queries": [
                {"indexUid": "movies", "q": "glass"},
                {"indexUid": "books", "q": "glass"},
            ]
        },
    )
    assert res.status == 200
    assert len(res.json["results"]) == 2
    assert res.json["results"][0]["indexUid"] == "movies"

    # federation
    res = client.post(
        "/multi-search",
        body={
            "federation": {},
            "queries": [
                {"indexUid": "movies", "q": "glass"},
                {"indexUid": "books", "q": "glass"},
            ],
        },
    )
    assert res.status == 200
    hits = res.json["hits"]
    assert len(hits) == 2
    assert all("_federation" in h for h in hits)


def test_ndjson_and_csv_payloads(client):
    raw = b'{"id": 1, "title": "a"}\n{"id": 2, "title": "b"}\n'
    res = client.post(
        "/indexes/movies/documents",
        headers={"content-type": "application/x-ndjson"},
        raw_body=raw,
    )
    task = client.wait_for_task(res.json["taskUid"])
    assert task["details"]["indexedDocuments"] == 2

    csv_raw = b"id:number,title\n3,c\n4,d\n"
    res = client.post(
        "/indexes/movies/documents",
        headers={"content-type": "text/csv"},
        raw_body=csv_raw,
    )
    task = client.wait_for_task(res.json["taskUid"])
    assert task["details"]["indexedDocuments"] == 2
    doc = client.get("/indexes/movies/documents/3").json
    assert doc["id"] == 3


def test_dump_and_snapshot(client):
    client.add_documents("movies", [{"id": 1}])
    res = client.post("/dumps")
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    res = client.post("/snapshots")
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"


def test_webhooks(client):
    res = client.post("/webhooks", body={"url": "http://localhost/hook"})
    assert res.status == 201
    wid = res.json["uuid"]
    assert client.get("/webhooks").json["results"]
    res = client.patch(f"/webhooks/{wid}", body={"headers": {"x": "y"}})
    assert res.json["headers"] == {"x": "y"}
    assert client.delete(f"/webhooks/{wid}").status == 204


def test_auth():
    app = App(master_key="MASTER_KEY")
    client = TestClient(app)
    try:
        # no key
        assert client.get("/indexes").status == 401
        # master key works
        master = TestClient(app, api_key="MASTER_KEY")
        assert master.get("/indexes").status == 200
        # default keys exist
        keys = master.get("/keys").json["results"]
        names = {k["name"] for k in keys}
        assert "Default Search API Key" in names
        assert "Default Admin API Key" in names
        search_key = next(
            k for k in keys if k["name"] == "Default Search API Key"
        )["key"]
        admin_key = next(
            k for k in keys if k["name"] == "Default Admin API Key"
        )["key"]
        # search key cannot create indexes
        searcher = TestClient(app, api_key=search_key)
        assert searcher.post("/indexes", body={"uid": "x"}).status == 403
        # admin key can
        admin = TestClient(app, api_key=admin_key)
        res = admin.post("/indexes", body={"uid": "x"})
        assert res.status == 202
        app.scheduler.wait_for_task(res.json["taskUid"])
        # search key can search
        admin_task = admin.post("/indexes/x/documents", body=[{"id": 1, "t": "hello"}])
        app.scheduler.wait_for_task(admin_task.json["taskUid"])
        assert searcher.post("/indexes/x/search", body={"q": "hello"}).status == 200
        # invalid key
        bad = TestClient(app, api_key="wrong")
        assert bad.get("/indexes").status == 403
        # scoped key
        res = master.post(
            "/keys",
            body={"actions": ["search"], "indexes": ["movies*"], "expiresAt": None},
        )
        assert res.status == 201
        scoped = TestClient(app, api_key=res.json["key"])
        assert scoped.post("/indexes/x/search", body={"q": ""}).status == 403
    finally:
        app.scheduler.stop()


def test_tenant_token():
    from meilisearch_tpu.engine.auth import generate_tenant_token

    app = App(master_key="MASTER_KEY")
    try:
        master = TestClient(app, api_key="MASTER_KEY")
        res = master.post("/indexes/products/documents", body=[
            {"id": 1, "title": "shoe", "brand": "nike"},
            {"id": 2, "title": "shoe", "brand": "adidas"},
        ])
        app.scheduler.wait_for_task(res.json["taskUid"])
        master.patch(
            "/indexes/products/settings",
            body={"filterableAttributes": ["brand"]},
        )
        app.scheduler.wait_for_all_tasks()
        keys = master.get("/keys").json["results"]
        skey = next(k for k in keys if k["name"] == "Default Search API Key")
        token = generate_tenant_token(
            skey["uid"], skey["key"], {"products": {"filter": "brand = nike"}}
        )
        t = TestClient(app, api_key=token)
        res = t.post("/indexes/products/search", body={"q": "shoe"})
        assert res.status == 200
        assert [h["id"] for h in res.json["hits"]] == [1]
        # token cannot reach other indexes
        res = master.post("/indexes/other/documents", body=[{"id": 1}])
        app.scheduler.wait_for_task(res.json["taskUid"])
        assert t.post("/indexes/other/search", body={"q": ""}).status == 403
    finally:
        app.scheduler.stop()
