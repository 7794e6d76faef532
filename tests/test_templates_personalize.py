"""documentTemplate rendering, composite embedders, index-time
auto-embedding, and personalization validation."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from meilisearch_tpu.types.errors import EngineError
from meilisearch_tpu.vector.personalization import (
    PersonalizationService,
    validate_personalize,
)
from meilisearch_tpu.vector.templates import (
    DEFAULT_TEMPLATE,
    render_document_template,
)


# -- templates ----------------------------------------------------------------


def test_default_template_searchable_fields():
    doc = {"id": 1, "title": "Dune", "year": 1965, "_geo": {"lat": 0}}
    out = render_document_template(None, doc, searchable={"title"})
    assert out == "title: Dune\n"


def test_default_template_all_searchable():
    doc = {"title": "Dune", "author": "Herbert", "missing": None}
    out = render_document_template(DEFAULT_TEMPLATE, doc)
    assert out == "title: Dune\nauthor: Herbert\n"


def test_custom_template_doc_access():
    out = render_document_template(
        "A movie called {{doc.title}} ({{doc.year}})",
        {"title": "Dune", "year": 1965},
    )
    assert out == "A movie called Dune (1965)"


def test_template_if_else_and_filters():
    tpl = "{% if doc.tag == 'x' %}X{% else %}{{ doc.words | truncatewords: 2 }}{% endif %}"
    assert render_document_template(tpl, {"tag": "x", "words": ""}) == "X"
    assert (
        render_document_template(tpl, {"tag": "y", "words": "a b c d"})
        == "a b..."
    )


def test_template_max_bytes_truncation():
    out = render_document_template(
        "{{doc.t}}", {"t": "x" * 1000}, max_bytes=10
    )
    assert out == "x" * 10


def test_template_syntax_error():
    with pytest.raises(EngineError):
        render_document_template("{% for x %}", {})


# -- auto-embedding through a local REST embedder ------------------------------


class _EmbedHandler(BaseHTTPRequestHandler):
    requests: list = []

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _EmbedHandler.requests.append(body)
        text = body["input"] if isinstance(body["input"], str) else body["input"][0]
        # embedding encodes the text length so tests can assert the template
        emb = [float(len(text)), 1.0, 0.0]
        payload = json.dumps({"embedding": emb}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture
def embed_server():
    _EmbedHandler.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _EmbedHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/embed"
    srv.shutdown()


def test_auto_embedding_on_document_addition(embed_server):
    from meilisearch_tpu.index.store import IndexStore
    from meilisearch_tpu.vector.embedders import ensure_document_embeddings

    store = IndexStore("movies", primary_key="id")
    store.settings.apply_json(
        {
            "embedders": {
                "default": {
                    "source": "rest",
                    "url": embed_server,
                    "request": {"input": "{{text}}"},
                    "documentTemplate": "t:{{doc.title}}",
                }
            }
        }
    )
    store.add_documents(
        [
            {"id": 1, "title": "abc"},
            {
                "id": 2,
                "title": "zz",
                "_vectors": {"default": {"embeddings": [9, 9, 9], "regenerate": False}},
            },
        ]
    )
    ensure_document_embeddings(store)
    # doc 1 embedded through the template ("t:abc" -> length 5)
    assert store.vectors["default"][0][0][0] == 5.0
    # doc 2 kept its user-provided vector (regenerate false)
    assert store.vectors["default"][1][0][0] == 9.0


def test_composite_embedder_search_vs_index(embed_server):
    from meilisearch_tpu.vector.embedders import Embedder, validate_embedder_settings

    conf = {
        "source": "composite",
        "searchEmbedder": {
            "source": "rest",
            "url": embed_server,
            "request": {"input": "{{text}}"},
        },
        "indexingEmbedder": {
            "source": "rest",
            "url": embed_server,
            "request": {"input": "{{text}}"},
        },
    }
    validate_embedder_settings("comp", conf)
    emb = Embedder("comp", conf)
    q = emb._embed("query")  # 5 chars
    assert q[0] == 5.0
    docs = emb.embed_documents(["abcdef"])  # 6 chars
    assert docs[0][0] == 6.0


def test_composite_requires_both_subs():
    from meilisearch_tpu.vector.embedders import validate_embedder_settings

    with pytest.raises(EngineError) as err:
        validate_embedder_settings("c", {"source": "composite"})
    assert "searchEmbedder" in str(err.value)


# -- personalization ------------------------------------------------------------


def test_personalize_validation():
    assert validate_personalize({"userContext": "likes scifi"}) == "likes scifi"
    with pytest.raises(EngineError) as err:
        validate_personalize({"userContext": 3})
    assert err.value.code.value == "invalid_search_personalize"
    with pytest.raises(EngineError):
        validate_personalize({"userContext": "x", "other": 1})


def test_personalize_disabled_feature():
    from meilisearch_tpu.index.store import IndexStore
    from meilisearch_tpu.search.perform import perform_search

    store = IndexStore("m", primary_key="id")
    store.add_documents([{"id": 1, "t": "hello"}])
    with pytest.raises(EngineError) as err:
        perform_search(
            store, {"q": "hello", "personalize": {"userContext": "ctx"}}
        )
    assert err.value.code.value == "feature_not_enabled"


def test_personalize_reranks_via_http(monkeypatch):
    service = PersonalizationService("key")
    monkeypatch.setattr(
        PersonalizationService,
        "_call_rerank",
        lambda self, prompt, docs: [2, 0, 1],
    )
    hits = [{"id": 1}, {"id": 2}, {"id": 3}]
    out = service.rerank_hits(hits, {"userContext": "u"}, "q")
    assert [h["id"] for h in out] == [3, 1, 2]
