"""Media fragments for multimodal REST embedders (reference:
vector/json_template/ JsonTemplate + settings.rs indexing_fragments /
search_fragments + the `media` search parameter, search/mod.rs:306-312)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from meilisearch_tpu.api.app import App, TestClient
from meilisearch_tpu.vector.templates import render_json_fragment


def test_render_json_fragment_basic():
    frag = {"text": "title: {{ doc.title }}"}
    out = render_json_fragment(frag, doc={"title": "kefir"})
    assert out == {"text": "title: kefir"}


def test_render_json_fragment_skips_on_missing():
    frag = {"image": "{{ media.image }}"}
    assert render_json_fragment(frag, doc={"title": "x"}) is None
    # a bare placeholder keeps the VALUE type (objects pass through)
    out = render_json_fragment(frag, media={"image": {"mime": "png", "data": "aGk="}})
    assert out == {"image": {"mime": "png", "data": "aGk="}}


def test_render_json_fragment_mixed():
    frag = {"parts": ["{{ q }}", {"nested": "{{ media.kind }}"}]}
    assert render_json_fragment(frag, media={"kind": "img"}, q="hello") == {
        "parts": ["hello", {"nested": "img"}]
    }
    assert render_json_fragment(frag, media={}) is None


class _EmbedServer(BaseHTTPRequestHandler):
    """Mock multimodal embedder: the embedding encodes which fragment shape
    arrived, so the test can assert routing."""

    requests: list = []

    def do_POST(self):
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"] or 0))
        )
        _EmbedServer.requests.append(body)
        frag = body.get("input") or {}
        if isinstance(frag, dict) and "image" in frag:
            emb = [1.0, 0.0, 0.0]
        elif isinstance(frag, dict) and "text" in frag:
            emb = [0.0, 1.0, 0.0]
        else:
            emb = [0.0, 0.0, 1.0]
        payload = json.dumps({"embeddings": [emb]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture
def embed_url():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _EmbedServer)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    _EmbedServer.requests = []
    yield f"http://127.0.0.1:{server.server_address[1]}/embed"
    server.shutdown()


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def test_fragments_end_to_end(client, embed_url):
    task = client.update_settings(
        "m",
        {
            "embedders": {
                "mm": {
                    "source": "rest",
                    "url": embed_url,
                    "request": {"input": "{{fragment}}"},
                    "response": {"embeddings": ["{{embedding}}"]},
                    "indexingFragments": {
                        "withimage": {"image": "{{ doc.image }}"},
                        "text": {"text": "{{ doc.title }}"},
                    },
                    "searchFragments": {
                        "image": {"image": "{{ media.image }}"},
                        "text": {"text": "{{ q }}"},
                    },
                }
            }
        },
    )
    assert task["status"] == "succeeded", task

    task = client.add_documents(
        "m",
        [
            {"id": 1, "title": "kefir", "image": "imgdata1"},
            {"id": 2, "title": "echo"},  # no image: only the text fragment
        ],
    )
    assert task["status"] == "succeeded", task

    store = client.app.scheduler.index("m")
    # doc 1: both fragments embedded; doc 2: text only
    assert store.vectors["mm"][0].shape == (2, 3)
    assert store.vectors["mm"][1].shape == (1, 3)

    # media search routes through the matching search fragment
    res = client.search(
        "m",
        {
            "q": "",
            "media": {"image": "querypic"},
            "hybrid": {"embedder": "mm", "semanticRatio": 1.0},
        },
    )
    assert res.status == 200, res.json
    assert res.json["hits"][0]["id"] == 1  # image-fragment vector wins

    # media without hybrid is rejected
    res = client.search("m", {"q": "", "media": {"image": "x"}})
    assert res.status == 400


def test_fragments_require_rest_source(client):
    task = client.update_settings(
        "m",
        {
            "embedders": {
                "bad": {
                    "source": "userProvided",
                    "dimensions": 3,
                    "indexingFragments": {"a": {"t": "{{ doc.x }}"}},
                }
            }
        },
    )
    assert task["status"] == "failed"
    assert "rest" in task["error"]["message"]
