"""Chat completions: the _meiliSearchInIndex tool-call loop against a fake
local LLM (reference routes/chats/chat_completions.rs)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from meilisearch_tpu.api.app import App, TestClient


class _FakeLLM(BaseHTTPRequestHandler):
    requests: list = []

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _FakeLLM.requests.append(body)
        has_tool_result = any(m.get("role") == "tool" for m in body["messages"])
        if not has_tool_result:
            # first round: ask Meilisearch to search
            msg = {
                "role": "assistant",
                "content": None,
                "tool_calls": [
                    {
                        "id": "call_1",
                        "type": "function",
                        "function": {
                            "name": "_meiliSearchInIndex",
                            "arguments": json.dumps(
                                {"index_uid": "kb", "q": "reset password"}
                            ),
                        },
                    }
                ],
            }
        else:
            tool_msg = next(m for m in body["messages"] if m["role"] == "tool")
            docs = json.loads(tool_msg["content"])["documents"]
            msg = {
                "role": "assistant",
                "content": f"Found {len(docs)} docs; first: "
                + docs[0]["title"],
            }
        payload = json.dumps(
            {
                "id": "chatcmpl-test",
                "model": body.get("model"),
                "choices": [{"index": 0, "message": msg, "finish_reason": "stop"}],
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture
def llm_server():
    _FakeLLM.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _FakeLLM)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture
def app():
    a = App()
    store = a.scheduler._get_or_create_index("kb", primary_key="id")
    store.add_documents(
        [
            {"id": 1, "title": "How to reset your password"},
            {"id": 2, "title": "Billing FAQ"},
        ]
    )
    client = TestClient(a)
    client.patch("/experimental-features", body={"chatCompletions": True})
    return a


def test_tool_call_loop(app, llm_server):
    client = TestClient(app)
    client.put(
        "/chats/support/settings",
        body={
            "source": "vLlm",
            "baseUrl": llm_server,
            "prompts": {"system": "You are a helpful support bot."},
        },
    )
    res = client.post(
        "/chats/support/chat/completions",
        body={
            "model": "test-model",
            "messages": [{"role": "user", "content": "how do I reset?"}],
        },
    )
    assert res.status == 200
    answer = res.json["choices"][0]["message"]["content"]
    assert "How to reset your password" in answer
    # two upstream calls: tool request, then final answer
    assert len(_FakeLLM.requests) == 2
    first = _FakeLLM.requests[0]
    # system prompt injected, search tool advertised with the index enum
    assert first["messages"][0]["role"] == "system"
    tool = first["tools"][-1]["function"]
    assert tool["name"] == "_meiliSearchInIndex"
    assert tool["parameters"]["properties"]["index_uid"]["enum"] == ["kb"]


def test_stream_mode_sse(app, llm_server):
    client = TestClient(app)
    client.put(
        "/chats/support/settings",
        body={"source": "vLlm", "baseUrl": llm_server},
    )
    from meilisearch_tpu.api.app import Request

    res = app.handle(
        Request(
            method="POST",
            path="/chats/support/chat/completions",
            query={},
            body={
                "model": "m",
                "stream": True,
                "messages": [{"role": "user", "content": "hi"}],
            },
            headers={},
        )
    )
    assert res.status == 200 and res.stream is not None
    data = b"".join(res.stream).decode()
    assert data.startswith("data: ")
    assert "data: [DONE]" in data


def test_duplicate_tool_rejected(app, llm_server):
    client = TestClient(app)
    client.put(
        "/chats/support/settings",
        body={"source": "vLlm", "baseUrl": llm_server},
    )
    res = client.post(
        "/chats/support/chat/completions",
        body={
            "model": "m",
            "messages": [],
            "tools": [
                {"type": "function", "function": {"name": "_meiliSearchInIndex"}}
            ],
        },
    )
    assert res.status == 400
    assert "already defined" in res.json["message"]


def test_unreachable_llm_clean_error(app):
    client = TestClient(app)
    client.put(
        "/chats/support/settings",
        body={"source": "vLlm", "baseUrl": "http://127.0.0.1:9"},
    )
    res = client.post(
        "/chats/support/chat/completions",
        body={"model": "m", "messages": []},
    )
    assert res.json["code"] == "remote_could_not_send_request"
