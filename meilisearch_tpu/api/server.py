"""HTTP server binding the route dispatcher to a socket.

Run: `python -m meilisearch_tpu.api.server --port 7700 [--master-key KEY]`
(the reference binary's `meilisearch --http-addr ...` equivalent,
crates/meilisearch/src/main.rs).
"""

from __future__ import annotations

import argparse
import json
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .app import App, Request


def make_handler(app: App):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _dispatch(self, method: str):
            parsed = urllib.parse.urlparse(self.path)
            query = {
                k: v[0] if len(v) == 1 else v
                for k, v in urllib.parse.parse_qs(parsed.query).items()
            }
            length = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(length) if length else b""
            body = None
            content_type = (self.headers.get("Content-Type") or "").split(";")[0]
            if raw and content_type in ("application/json", ""):
                try:
                    body = json.loads(raw.decode("utf-8"))
                except json.JSONDecodeError as err:
                    self._send(
                        400,
                        {
                            "message": f"The json payload provided is malformed. `{err}`.",
                            "code": "malformed_payload",
                            "type": "invalid_request",
                            "link": "https://docs.meilisearch.com/errors#malformed_payload",
                        },
                    )
                    return
            req = Request(
                method=method,
                path=parsed.path,
                query=query,
                body=body,
                headers={k.lower(): v for k, v in self.headers.items()},
                raw_body=raw or None,
            )
            res = app.handle(req)
            if res.body is not None:
                self.send_response(res.status)
                for k, v in res.headers.items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(res.body)))
                self.end_headers()
                self.wfile.write(res.body)
            else:
                self._send(res.status, res.json, res.headers)

        def _send(self, status: int, payload, headers=None):
            data = b"" if payload is None else json.dumps(payload).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            if data:
                self.wfile.write(data)

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_PUT(self):
            self._dispatch("PUT")

        def do_PATCH(self):
            self._dispatch("PATCH")

        def do_DELETE(self):
            self._dispatch("DELETE")

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(host: str = "127.0.0.1", port: int = 7700, master_key=None, app=None):
    app = app or App(master_key=master_key)
    server = ThreadingHTTPServer((host, port), make_handler(app))
    print(f"meilisearch-tpu listening on http://{host}:{port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7700)
    parser.add_argument("--master-key", default=None)
    parser.add_argument("--import-dump", default=None)
    parser.add_argument("--import-snapshot", default=None)
    args = parser.parse_args()
    app = App(master_key=args.master_key)
    if args.import_dump:
        from ..engine.dumps import load_dump

        load_dump(app.scheduler, args.import_dump)
    if args.import_snapshot:
        from ..engine.dumps import load_snapshot

        load_snapshot(app.scheduler, args.import_snapshot)
    serve(args.host, args.port, app=app)


if __name__ == "__main__":
    main()
