"""Chat completions: the _meiliSearchInIndex tool-call loop against a fake
local LLM (reference routes/chats/chat_completions.rs)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from meilisearch_tpu.api.app import App, TestClient


class _FakeLLM(BaseHTTPRequestHandler):
    requests: list = []

    def _stream(self, body):
        """SSE mode: round 1 streams a tool call split across delta
        chunks (accumulation exercised), round 2 streams the answer
        token by token (passthrough exercised)."""
        has_tool_result = any(m.get("role") == "tool" for m in body["messages"])
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()

        def chunk(delta, finish=None):
            payload = {
                "id": "chatcmpl-test",
                "object": "chat.completion.chunk",
                "model": body.get("model"),
                "choices": [
                    {"index": 0, "delta": delta, "finish_reason": finish}
                ],
            }
            self.wfile.write(f"data: {json.dumps(payload)}\n\n".encode())

        if not has_tool_result:
            args = json.dumps({"index_uid": "kb", "q": "reset password"})
            chunk({"role": "assistant", "tool_calls": [
                {"index": 0, "id": "call_1", "type": "function",
                 "function": {"name": "_meiliSearchInIndex", "arguments": args[:9]}}]})
            chunk({"tool_calls": [
                {"index": 0, "function": {"arguments": args[9:]}}]})
            chunk({}, finish="tool_calls")
        else:
            tool_msg = next(m for m in body["messages"] if m["role"] == "tool")
            docs = json.loads(tool_msg["content"])["documents"]
            chunk({"role": "assistant", "content": "Found "})
            chunk({"content": f"{len(docs)} docs; first: "})
            chunk({"content": docs[0]["title"]}, finish="stop")
        self.wfile.write(b"data: [DONE]\n\n")

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _FakeLLM.requests.append(body)
        if body.get("stream"):
            self._stream(body)
            return
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
            headers={"Content-Type": "application/json"},
        )
    )
    assert res.status == 200 and res.stream is not None
    parts = list(res.stream)
    data = b"".join(parts).decode()
    assert data.startswith("data: ")
    assert "data: [DONE]" in data
    # token-level passthrough: the answer arrives as MULTIPLE content
    # deltas relayed from upstream, and the tool loop ran (two upstream
    # streams), with tool-call deltas interpreted rather than forwarded
    deltas = [
        json.loads(p.decode()[6:])["choices"][0]["delta"]
        for p in parts
        if p.startswith(b"data: {")
    ]
    contents = [d.get("content") for d in deltas if d.get("content")]
    assert len(contents) >= 3, deltas
    assert "".join(contents).endswith("How to reset your password")
    assert not any(d.get("tool_calls") for d in deltas)
    assert len(_FakeLLM.requests) == 2


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


def test_azure_openai_validation_and_url(app, llm_server):
    """azureOpenAi parity (reference features.rs:84-95, chats/config.rs:34-48):
    settings validation requires baseUrl+deploymentId+apiVersion; requests go
    to the deployment-scoped path with api-version + api-key header."""
    client = TestClient(app)
    r = client.put(
        "/chats/az/settings",
        body={"source": "azureOpenAi", "baseUrl": llm_server},
    )
    assert r.status == 400
    assert (
        r.json["message"]
        == "azureOpenAi requires setting a valid `baseUrl`, `deploymentId`,"
        " and `apiVersion`"
    )

    r = client.put("/chats/az/settings", body={"source": "vLlm"})
    assert r.status == 400
    assert r.json["message"] == "vLlm requires setting a valid `baseUrl`"

    r = client.put(
        "/chats/az/settings",
        body={"source": "gemini", "baseUrl": llm_server},
    )
    assert r.status == 400
    assert "expected one of `openAi`, `azureOpenAi`, `mistral`, `vLlm`" in r.json["message"]

    r = client.put(
        "/chats/az/settings",
        body={
            "source": "azureOpenAi",
            "baseUrl": llm_server,
            "deploymentId": "gpt4-deploy",
            "apiVersion": "2024-02-01",
            "apiKey": "azure-secret-key-0123456789",
        },
    )
    assert r.status == 200

    # the deployment URL scheme: the fake LLM records the path it was hit on
    class _PathRecorder(_FakeLLM):
        paths: list = []

        def do_POST(self):
            _PathRecorder.paths.append(self.path)
            _FakeLLM.do_POST(self)

    from meilisearch_tpu.engine.chat import _llm_request

    ws = app.scheduler.chat_workspaces["az"]
    req = _llm_request(ws, {"model": "gpt-4o", "messages": []})
    assert req.full_url == (
        f"{llm_server}/openai/deployments/gpt4-deploy/chat/completions"
        "?api-version=2024-02-01"
    )
    assert req.headers["Api-key"] == "azure-secret-key-0123456789"
    assert "Authorization" not in req.headers

    # secret masking follows the reference's length-scaled prefixes
    r = client.get("/chats/az/settings")
    assert r.json["apiKey"] == "azuXXXXX..."
