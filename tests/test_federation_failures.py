"""Federation failure-mode goldens (port of the error scenarios of
/root/reference/crates/meilisearch/tests/search/multi/proxy.rs).

`LocalMeili` wraps a real in-process App behind a raw HTTP server with
injectable delay, failure policy (never/once/always), and response
rewriting — the reference's MockServer harness (proxy.rs:5278-5380).
Each scenario pins the exact {message, code, type, link} surface of
`remoteErrors` plus the retry/backoff behavior:

  * transport errors, 5xx and unparseable bodies RETRY (try_count=3 + a
    final attempt, proxy.rs try_json_proxy);
  * timeouts, auth failures and 4xx GIVE UP immediately;
  * exhausted retries put the remote in its availability-backoff window
    (fail-fast on the next request, no HTTP).
"""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from meilisearch_tpu.api.app import App, TestClient
from meilisearch_tpu.api.federation import REMOTE_AVAILABILITY


class LocalMeili:
    """A real App behind a fault-injecting HTTP proxy (reference
    LocalMeiliParams: delay / fails / override_response_body)."""

    def __init__(
        self,
        app=None,
        delay=0.0,
        fails="never",  # never | once | always
        fail_status=500,
        fail_body=None,
        override_body=None,
    ):
        self.app = app
        self.client = TestClient(app) if app is not None else None
        self.requests = 0
        self._failed_already = False
        harness = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                harness.requests += 1
                if delay:
                    time.sleep(delay)
                if fails == "always" or (
                    fails == "once" and not harness._failed_already
                ):
                    harness._failed_already = True
                    body = fail_body or json.dumps(
                        {
                            "error": "provoked error",
                            "code": "test_error",
                            "link": "https://docs.meilisearch.com/errors#test_error",
                        }
                    )
                    self.send_response(fail_status)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body.encode())
                    return
                if override_body is not None:
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(override_body.encode())
                    return
                n = int(self.headers.get("Content-Length") or 0)
                payload = json.loads(self.rfile.read(n) or b"null")
                res = harness.client.request("POST", self.path, body=payload)
                self.send_response(res.status)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(res.json).encode())

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}"

    def shutdown(self):
        self.server.shutdown()


@pytest.fixture(autouse=True)
def _fresh_backoff():
    REMOTE_AVAILABILITY._state.clear()
    yield
    REMOTE_AVAILABILITY._state.clear()


def _nodes(remote: LocalMeili):
    ms0 = App()
    c0 = TestClient(ms0)
    c0.patch("/experimental-features", body={"network": True})
    c0.patch(
        "/network",
        body={"self": "ms0", "remotes": {"ms1": {"url": remote.url}}},
    )
    c0.add_documents("test", [{"id": "A", "title": "local batman returns"}])
    return ms0, c0


def _remote_app():
    ms1 = App()
    c1 = TestClient(ms1)
    c1.add_documents("test", [{"id": "C", "title": "remote batman returns"}])
    return ms1


FED_REQUEST = {
    "federation": {},
    "queries": [
        {"indexUid": "test", "q": "batman returns"},
        {
            "indexUid": "test",
            "q": "batman returns",
            "federationOptions": {"remote": "ms1"},
        },
    ],
}


def _run(c0):
    res = c0.post("/multi-search", body=FED_REQUEST)
    assert res.status == 200, res.json
    return res.json


def test_remote_500_always_partial_results():
    remote = LocalMeili(fails="always")
    ms0, c0 = _nodes(remote)
    try:
        body = _run(c0)
        assert [h["id"] for h in body["hits"]] == ["A"]
        err = body["remoteErrors"]["ms1"]
        assert err["code"] == "remote_remote_error"
        assert err["type"] == "system"
        assert err["link"] == (
            "https://docs.meilisearch.com/errors#remote_remote_error"
        )
        assert err["message"] == (
            "remote host responded with code 500:\n  - response from remote:"
            ' {"error":"provoked error","code":"test_error",'
            '"link":"https://docs.meilisearch.com/errors#test_error"}'
        )
        # retryable: 3 retries + final attempt all hit the remote
        assert remote.requests == 4
    finally:
        remote.shutdown()
        ms0.scheduler.stop()


def test_remote_500_once_is_transparently_retried():
    ms1 = _remote_app()
    remote = LocalMeili(app=ms1, fails="once")
    ms0, c0 = _nodes(remote)
    try:
        body = _run(c0)
        assert body.get("remoteErrors", {}) == {}
        assert {h["id"] for h in body["hits"]} == {"A", "C"}
        assert remote.requests == 2  # the failed try + the successful retry
    finally:
        remote.shutdown()
        ms0.scheduler.stop()
        ms1.scheduler.stop()


def test_remote_does_not_answer():
    remote = LocalMeili(fails="always")
    ms0, c0 = _nodes(remote)
    # re-point at a dead port AFTER registration
    c0.patch(
        "/network", body={"remotes": {"ms1": {"url": "http://127.0.0.1:9"}}}
    )
    try:
        body = _run(c0)
        assert [h["id"] for h in body["hits"]] == ["A"]
        err = body["remoteErrors"]["ms1"]
        assert err["message"] == "error sending request"
        assert err["code"] == "remote_could_not_send_request"
        assert err["type"] == "system"
    finally:
        remote.shutdown()
        ms0.scheduler.stop()


def test_remote_404_is_bad_request_with_hints():
    remote = LocalMeili(fails="always", fail_status=404, fail_body="null")
    ms0, c0 = _nodes(remote)
    try:
        body = _run(c0)
        err = body["remoteErrors"]["ms1"]
        assert err["code"] == "remote_bad_request"
        assert err["type"] == "invalid_request"
        assert err["message"] == (
            "remote host responded with code 404:"
            "\n  - response from remote: null"
            "\n  - hint: check that the remote instance has the correct"
            " index configuration for that request"
            "\n  - hint: check that the `network` experimental feature is"
            " enabled on the remote instance"
        )
        assert remote.requests == 1  # 4xx gives up: no retries
    finally:
        remote.shutdown()
        ms0.scheduler.stop()


def test_remote_auth_failure():
    remote = LocalMeili(fails="always", fail_status=403, fail_body="null")
    ms0, c0 = _nodes(remote)
    try:
        body = _run(c0)
        err = body["remoteErrors"]["ms1"]
        assert err["code"] == "remote_invalid_api_key"
        assert err["type"] == "auth"
        assert err["message"] == (
            "could not authenticate against the remote host"
            "\n  - hint: check that the remote instance was registered"
            " with a valid API key having the `search` action"
        )
        assert remote.requests == 1
    finally:
        remote.shutdown()
        ms0.scheduler.stop()


def test_remote_bad_response_html():
    remote = LocalMeili(override_body="<html>Returning an HTML page</html>")
    ms0, c0 = _nodes(remote)
    try:
        body = _run(c0)
        err = body["remoteErrors"]["ms1"]
        assert err["code"] == "remote_bad_response"
        assert err["type"] == "system"
        assert err["message"] == (
            "could not parse response from the remote host as a federated"
            " search response:\n  - response from remote:"
            " <html>Returning an HTML page</html>"
            "\n  - hint: check that the remote instance is a Meilisearch"
            " instance running the same version"
        )
        assert remote.requests == 4  # unparseable bodies retry
    finally:
        remote.shutdown()
        ms0.scheduler.stop()


def test_remote_hit_missing_weighted_score():
    remote = LocalMeili(
        override_body=json.dumps(
            {"hits": [{"id": "C", "title": "x", "_federation": {}}]}
        )
    )
    ms0, c0 = _nodes(remote)
    try:
        body = _run(c0)
        err = body["remoteErrors"]["ms1"]
        assert err["code"] == "remote_bad_response"
        assert err["message"] == (
            "remote hit does not contain"
            " `._federation.weightedRankingScore`"
            "\n  - hint: check that the remote instance is a Meilisearch"
            " instance running the same version"
        )
        assert [h["id"] for h in body["hits"]] == ["A"]
    finally:
        remote.shutdown()
        ms0.scheduler.stop()


def test_remote_timeout(monkeypatch):
    monkeypatch.setenv("MEILI_EXPERIMENTAL_REMOTE_SEARCH_TIMEOUT_SECONDS", "1")
    ms1 = _remote_app()
    remote = LocalMeili(app=ms1, delay=2.5)
    ms0, c0 = _nodes(remote)
    try:
        body = _run(c0)
        err = body["remoteErrors"]["ms1"]
        assert err["code"] == "remote_timeout"
        assert err["type"] == "system"
        assert err["message"] == "remote host did not answer before the deadline"
        assert [h["id"] for h in body["hits"]] == ["A"]
    finally:
        remote.shutdown()
        ms0.scheduler.stop()
        ms1.scheduler.stop()


def test_backoff_window_fails_fast_without_http():
    remote = LocalMeili(fails="always")
    ms0, c0 = _nodes(remote)
    try:
        _run(c0)  # exhausts retries -> backoff window opens
        n = remote.requests
        assert n == 4
        body = _run(c0)  # inside the window: fail fast, no HTTP
        assert remote.requests == n
        err = body["remoteErrors"]["ms1"]
        assert err["code"] == "remote_could_not_send_request"
        assert "backoff window" in err["message"]
    finally:
        remote.shutdown()
        ms0.scheduler.stop()


def test_auth_failure_does_not_open_backoff():
    remote = LocalMeili(fails="always", fail_status=401, fail_body="null")
    ms0, c0 = _nodes(remote)
    try:
        _run(c0)
        assert remote.requests == 1
        _run(c0)  # give-up errors never open the window: HTTP again
        assert remote.requests == 2
    finally:
        remote.shutdown()
        ms0.scheduler.stop()


def test_response_rewrite_extra_fields_tolerated():
    # a remote running a newer version may add fields: unknown response
    # keys and unknown hit keys must pass through, not fail parsing
    remote = LocalMeili(
        override_body=json.dumps(
            {
                "hits": [
                    {
                        "id": "C",
                        "title": "remote batman returns",
                        "futureField": {"x": 1},
                        "_federation": {
                            "indexUid": "test",
                            "queriesPosition": 0,
                            "weightedRankingScore": 0.95,
                        },
                    }
                ],
                "processingTimeMs": 1,
                "someFutureTopLevelField": True,
            }
        )
    )
    ms0, c0 = _nodes(remote)
    try:
        body = _run(c0)
        assert body.get("remoteErrors", {}) == {}
        ids = [h["id"] for h in body["hits"]]
        assert set(ids) == {"A", "C"}
        hit_c = next(h for h in body["hits"] if h["id"] == "C")
        assert hit_c["_federation"]["remote"] == "ms1"
        assert hit_c["futureField"] == {"x": 1}
    finally:
        remote.shutdown()
        ms0.scheduler.stop()
