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
            if getattr(res, "stream", None) is not None:
                self.send_response(res.status)
                for k, v in res.headers.items():
                    self.send_header(k, v)
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                try:
                    for chunk in res.stream:
                        self.wfile.write(
                            f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n"
                        )
                        self.wfile.flush()
                    self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass
                return
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
    import atexit
    import os

    from ..engine.dumps import create_snapshot, load_dump, load_snapshot
    from ..option import load_options

    opt = load_options()
    app = App(
        master_key=opt.master_key,
        personalization_api_key=opt.experimental_personalization_api_key,
    )
    if opt.experimental_enable_metrics:
        app.scheduler.runtime_features["metrics"] = True
    app.scheduler.dump_dir = opt.dump_dir

    # boot-time state restore: explicit imports win over the db-path snapshot
    # (reference: lib.rs open_or_create_database --import-dump/--import-snapshot)
    from ..engine.journal import TaskJournal, replay_journal

    os.makedirs(opt.db_path, exist_ok=True)
    journal = TaskJournal(opt.db_path)
    db_snapshot = os.path.join(opt.db_path, "data.ms.snapshot")
    if opt.import_dump:
        load_dump(app.scheduler, opt.import_dump, auth=app.auth)
        journal.clear()  # explicit import = fresh history
    elif opt.import_snapshot:
        load_snapshot(app.scheduler, opt.import_snapshot)
        journal.clear()
    else:
        if os.path.exists(db_snapshot):
            load_snapshot(app.scheduler, db_snapshot)
        # crash recovery: acknowledged-but-unsnapshotted tasks re-enqueue
        # from the WAL and reprocess (idempotent-by-replay, SURVEY §5)
        replayed = replay_journal(app.scheduler, journal)
        if replayed:
            print(f"replayed {replayed} journaled task(s) from the WAL")
    app.scheduler.journal = journal

    def persist():
        try:
            app.scheduler.checkpoint()
        except Exception:
            pass

    atexit.register(persist)

    if opt.schedule_snapshot:
        import threading

        def snapshot_loop():
            import time as _t

            while True:
                _t.sleep(opt.schedule_snapshot)
                try:
                    os.makedirs(opt.snapshot_dir, exist_ok=True)
                    create_snapshot(app.scheduler, opt.snapshot_dir)
                    # a scheduled snapshot is also a durability checkpoint
                    app.scheduler.checkpoint()
                except Exception:
                    pass

        threading.Thread(target=snapshot_loop, daemon=True).start()

    serve(opt.host, opt.port, app=app)


if __name__ == "__main__":
    main()
