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


# -- sandbox hardening ----------------------------------------------------------
# exec() with restricted builtins is not a sandbox on its own; the AST
# validator must reject every rung of the class-ladder escape.

ESCAPES = [
    "doc.title = ().__class__.__mro__[1].__subclasses__()",
    "x = (1).__class__",
    "import os\ndoc.title = 'x'",
    "from os import system",
    "doc.title = __builtins__",
    "g = (i for i in [1]); f = g.gi_frame; doc.title = f.f_builtins",
    "def f():\n    global doc\n    doc = None\nf()",
    "x = str.format_map",
]


def test_sandbox_rejects_escapes(client):
    client.patch(
        "/experimental-features", body={"editDocumentsByFunction": True}
    )
    client.add_documents("movies", [{"id": 1, "title": "a"}])
    for src in ESCAPES:
        res = client.post(
            "/indexes/movies/documents/edit", body={"function": src}
        )
        task = client.wait_for_task(res.json["taskUid"])
        assert task["status"] == "failed", src
        assert "not allowed" in task["error"]["message"], (
            src,
            task["error"]["message"],
        )
    # the documents were never touched
    assert client.get("/indexes/movies/documents/1").json["title"] == "a"


def test_sandbox_operation_budget(client):
    client.patch(
        "/experimental-features", body={"editDocumentsByFunction": True}
    )
    client.add_documents("movies", [{"id": 1, "title": "a"}])
    res = client.post(
        "/indexes/movies/documents/edit",
        body={"function": "while True:\n    pass"},
    )
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "failed"
    assert "budget" in task["error"]["message"]


def test_sandbox_allows_normal_scripts(client):
    client.patch(
        "/experimental-features", body={"editDocumentsByFunction": True}
    )
    client.add_documents("movies", [{"id": 1, "title": "abc", "n": 3}])
    res = client.post(
        "/indexes/movies/documents/edit",
        body={
            "function": (
                "parts = sorted([doc.title.upper(), str(doc.n)])\n"
                "doc.title = '-'.join(parts)"
            )
        },
    )
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded", task
    assert client.get("/indexes/movies/documents/1").json["title"] == "3-ABC"
