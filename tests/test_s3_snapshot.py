"""S3 snapshot upload against a local mock bucket (EE parity:
index-scheduler/src/scheduler/enterprise_edition/s3.rs).

The mock validates the presigned-URL shape (SigV4 query parameters) and
recomputes the signature with the shared secret, so a drift in canonical
request construction fails loudly. A snapshot uploaded through the full
scheduler task is then reloaded into a fresh instance to prove the bytes
round-trip.
"""

import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from meilisearch_tpu.engine.s3_snapshot import (
    S3SnapshotOpts,
    presign,
    upload_snapshot_to_s3,
)

os.environ.setdefault("MEILI_TPU_ALLOW_LOCAL_URLS", "1")


class MockS3(BaseHTTPRequestHandler):
    store: dict = {}
    uploads: dict = {}
    secret = "test-secret-key"

    def log_message(self, *a):
        pass

    def _check_sig(self):
        parsed = urllib.parse.urlparse(self.path)
        q = dict(urllib.parse.parse_qsl(parsed.query, keep_blank_values=True))
        assert q.get("X-Amz-Algorithm") == "AWS4-HMAC-SHA256", q
        assert q.get("X-Amz-SignedHeaders") == "host"
        cred = q.get("X-Amz-Credential", "")
        access_key, date, region, service, req = cred.split("/")
        assert service == "s3" and req == "aws4_request"
        # recompute the signature server-side with the shared secret
        sig = q.pop("X-Amz-Signature")
        import time as _t

        now = _t.strptime(q["X-Amz-Date"], "%Y%m%dT%H%M%SZ")
        url = presign(
            self.command,
            f"http://{self.headers['Host']}",
            region,
            parsed.path,
            {
                k: v
                for k, v in q.items()
                if not k.startswith("X-Amz-")
            },
            access_key,
            self.secret,
            expires=int(q["X-Amz-Expires"]),
            now=now,
        )
        expect_sig = dict(
            urllib.parse.parse_qsl(urllib.parse.urlparse(url).query)
        )["X-Amz-Signature"]
        assert sig == expect_sig, (sig, expect_sig)
        return parsed, q

    def do_PUT(self):
        parsed, q = self._check_sig()
        body = self.rfile.read(int(self.headers["Content-Length"]))
        if "partNumber" in q:
            parts = self.uploads.setdefault(q["uploadId"], {})
            parts[int(q["partNumber"])] = body
            etag = f'"etag-{q["partNumber"]}"'
            self.send_response(200)
            self.send_header("ETag", etag)
            self.end_headers()
            return
        self.store[parsed.path] = body
        self.send_response(200)
        self.end_headers()

    def do_POST(self):
        parsed, q = self._check_sig()
        if "uploads" in q:
            self.uploads["upload-1"] = {}
            body = (
                b"<InitiateMultipartUploadResult>"
                b"<UploadId>upload-1</UploadId>"
                b"</InitiateMultipartUploadResult>"
            )
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        # complete
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        parts = self.uploads[q["uploadId"]]
        self.store[parsed.path] = b"".join(
            parts[i] for i in sorted(parts)
        )
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()


@pytest.fixture
def mock_s3():
    MockS3.store = {}
    MockS3.uploads = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), MockS3)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}", MockS3
    server.shutdown()


def make_opts(url, **kw):
    return S3SnapshotOpts(
        bucket_url=url,
        bucket_region="us-east-1",
        bucket_name="bkt",
        snapshot_prefix="snaps",
        access_key="AKIAEXAMPLE",
        secret_key=MockS3.secret,
        **kw,
    )


def test_single_put_upload(tmp_path, mock_s3):
    url, mock = mock_s3
    f = tmp_path / "snap.tar.gz"
    f.write_bytes(b"hello snapshot bytes")
    key = upload_snapshot_to_s3(str(f), make_opts(url))
    assert key == "snaps/data.ms.snapshot"
    assert mock.store["/bkt/snaps/data.ms.snapshot"] == b"hello snapshot bytes"


def test_multipart_upload(tmp_path, mock_s3):
    url, mock = mock_s3
    payload = bytes(range(256)) * 1024  # 256 KiB
    f = tmp_path / "snap.tar.gz"
    f.write_bytes(payload)
    key = upload_snapshot_to_s3(str(f), make_opts(url, part_size=100 * 1024))
    assert key == "snaps/data.ms.snapshot"
    assert mock.store["/bkt/snaps/data.ms.snapshot"] == payload
    assert len(mock.uploads["upload-1"]) == 3  # 100k + 100k + 56k


def test_scheduler_snapshot_task_uploads_and_roundtrips(tmp_path, mock_s3):
    url, mock = mock_s3
    from meilisearch_tpu.api.app import App, TestClient

    app = App()
    client = TestClient(app)
    app.scheduler.s3_opts = make_opts(url)
    client.add_documents("movies", [{"id": 1, "title": "dune"}])
    res = client.post("/snapshots")
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded", task
    assert task["details"]["s3Object"] == "snaps/data.ms.snapshot"
    blob = mock.store["/bkt/snaps/data.ms.snapshot"]

    # round-trip: restore the uploaded snapshot into a fresh instance
    snap = tmp_path / "restored.snapshot"
    snap.write_bytes(blob)
    from meilisearch_tpu.engine.dumps import load_snapshot

    app2 = App()
    load_snapshot(app2.scheduler, str(snap))
    client2 = TestClient(app2)
    r = client2.post("/indexes/movies/search", body={"q": "dune"})
    assert [h["id"] for h in r.json["hits"]] == [1]
    app.scheduler.stop()
    app2.scheduler.stop()


def test_options_group_requires_all():
    import types

    opt = types.SimpleNamespace(
        s3_bucket_url="http://x", s3_bucket_region=None,
        s3_bucket_name="b", s3_snapshot_prefix="p",
    )
    assert S3SnapshotOpts.from_options(opt) is None
