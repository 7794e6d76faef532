"""Server option layering: CLI > env > config.toml."""

import pytest

from meilisearch_tpu.option import load_options


def test_defaults(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    opt = load_options([])
    assert opt.http_addr == "localhost:7700"
    assert opt.port == 7700
    assert opt.master_key is None


def test_env_overrides_config(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "config.toml").write_text(
        'http_addr = "0.0.0.0:1111"\nmaster_key = "from-config"\n'
    )
    opt = load_options([])
    assert opt.http_addr == "0.0.0.0:1111"
    assert opt.master_key == "from-config"

    monkeypatch.setenv("MEILI_MASTER_KEY", "from-env")
    opt = load_options([])
    assert opt.master_key == "from-env"

    opt = load_options(["--master-key", "from-cli", "--port", "2222"])
    assert opt.master_key == "from-cli"
    assert opt.port == 2222


def test_production_requires_master_key(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit):
        load_options(["--env", "production"])
    opt = load_options(["--env", "production", "--master-key", "k"])
    assert opt.env == "production"


def test_full_option_surface(monkeypatch, tmp_path):
    """Round-2 option surface: the reference Opt's 82 public fields across
    Opt/IndexerOpts/S3SnapshotOpts (option.rs:212,799,896) map onto _FIELDS
    + the split --host/--port convenience flags."""
    from meilisearch_tpu.option import _FIELDS

    monkeypatch.chdir(tmp_path)
    assert len(_FIELDS) >= 55
    # every field has a CLI flag and a MEILI_ env var
    opt = load_options(["--experimental-contains-filter"])
    assert opt.experimental_contains_filter is True
    monkeypatch.setenv("MEILI_EXPERIMENTAL_SEARCH_QUEUE_SIZE", "77")
    monkeypatch.setenv("MEILI_TASK_WEBHOOK_URL", "https://example.com/hook")
    monkeypatch.setenv("MEILI_IGNORE_MISSING_DUMP", "true")
    opt = load_options([])
    assert opt.experimental_search_queue_size == 77
    assert opt.task_webhook_url == "https://example.com/hook"
    assert opt.ignore_missing_dump is True


def test_parse_byte_size():
    from meilisearch_tpu.option import parse_byte_size

    assert parse_byte_size("100 MB") == 100 * 10**6
    assert parse_byte_size("2 TiB") == 2 * 2**40
    assert parse_byte_size("1048576") == 1048576
    assert parse_byte_size(None) is None
    assert parse_byte_size("nonsense") is None


def test_payload_size_limit_enforced(tmp_path):
    import json
    import threading
    import urllib.error
    import urllib.request

    from http.server import ThreadingHTTPServer

    from meilisearch_tpu.api.app import App
    from meilisearch_tpu.api.server import make_handler

    app = App()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 7817), make_handler(app, payload_limit=64)
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        big = json.dumps([{"id": 1, "text": "x" * 500}]).encode()
        req = urllib.request.Request(
            "http://127.0.0.1:7817/indexes/m/documents",
            data=big,
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 413
        assert json.loads(e.value.read())["code"] == "payload_too_large"
        # small payloads still pass
        small = json.dumps({"q": "x"}).encode()
        req = urllib.request.Request(
            "http://127.0.0.1:7817/health", method="GET"
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
    finally:
        server.shutdown()
        app.scheduler.stop()


def test_allowed_ip_networks(monkeypatch):
    from meilisearch_tpu.types.errors import EngineError
    from meilisearch_tpu.utils.http_policy import check_url_policy

    monkeypatch.setenv("MEILI_TPU_ALLOW_LOCAL_URLS", "0")
    monkeypatch.delenv("MEILI_EXPERIMENTAL_ALLOWED_IP_NETWORKS", raising=False)
    with pytest.raises(EngineError):
        check_url_policy("http://127.0.0.1:9999/x")
    monkeypatch.setenv("MEILI_EXPERIMENTAL_ALLOWED_IP_NETWORKS", "127.0.0.0/8")
    check_url_policy("http://127.0.0.1:9999/x")  # allow-listed now
