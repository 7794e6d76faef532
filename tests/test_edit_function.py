"""Document edition by function (feature-gated)."""

import pytest

from meilisearch_tpu.api.app import App, TestClient


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def test_edit_requires_feature(client):
    client.add_documents("movies", [{"id": 1, "title": "a"}])
    res = client.post(
        "/indexes/movies/documents/edit", body={"function": "doc.title = 'b'"}
    )
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "failed"
    assert task["error"]["code"] == "feature_not_enabled"


def test_edit_documents(client):
    client.patch("/experimental-features", body={"editDocumentsByFunction": True})
    client.add_documents(
        "movies",
        [
            {"id": 1, "title": "alpha", "views": 10},
            {"id": 2, "title": "beta", "views": 20},
        ],
    )
    client.update_settings("movies", {"filterableAttributes": ["title"]})
    res = client.post(
        "/indexes/movies/documents/edit",
        body={
            "function": "doc.views = doc.views * 2",
            "filter": "title = alpha",
        },
    )
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded", task
    assert task["details"]["editedDocuments"] == 1
    assert client.get("/indexes/movies/documents/1").json["views"] == 20
    assert client.get("/indexes/movies/documents/2").json["views"] == 20


def test_edit_with_context_and_delete(client):
    client.patch("/experimental-features", body={"editDocumentsByFunction": True})
    client.add_documents("movies", [{"id": 1, "tag": "x"}, {"id": 2, "tag": "y"}])
    res = client.post(
        "/indexes/movies/documents/edit",
        body={
            "function": "doc.tag = context['suffix'] + doc.tag",
            "context": {"suffix": "pre-"},
        },
    )
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    assert client.get("/indexes/movies/documents/1").json["tag"] == "pre-x"

    # clearing doc deletes it
    res = client.post(
        "/indexes/movies/documents/edit", body={"function": "doc = {}"}
    )
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"
    assert client.get("/indexes/movies/documents").json["total"] == 0
