"""Cutoff/degraded search, ranking score details, export, chats, CLI."""

import pytest

from meilisearch_tpu.api.app import App, TestClient
from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import perform_search


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def make_store():
    store = IndexStore("movies", primary_key="id")
    store.settings.apply_json({"sortableAttributes": ["rating"]})
    store.add_documents(
        [
            {"id": 1, "title": "Glass blower", "rating": 3},
            {"id": 2, "title": "Glass castle", "rating": 5},
            {"id": 3, "title": "Stained glass glass", "rating": 1},
        ]
    )
    return store


def test_search_cutoff_degraded():
    store = make_store()
    store.settings.search_cutoff_ms = 0  # everything is past the deadline
    res = perform_search(store, {"q": "glass"})
    assert res.get("degraded") is True
    # results still returned (docid order)
    assert len(res["hits"]) == 3


def test_ranking_score_details():
    store = make_store()
    res = perform_search(
        store, {"q": "glass castle", "showRankingScoreDetails": True,
                "showRankingScore": True}
    )
    hit = res["hits"][0]
    assert hit["title"] == "Glass castle"
    details = hit["_rankingScoreDetails"]
    assert details["words"]["score"] == 1.0
    assert details["typo"]["typoCount"] == 0
    assert "proximity" in details
    assert 0 < hit["_rankingScore"] <= 1.0


def test_ranking_score_orders_sorted():
    store = make_store()
    res = perform_search(
        store,
        {"q": "glass", "sort": ["rating:desc"], "showRankingScoreDetails": True},
    )
    # sort detail carries the value
    details = res["hits"][0]["_rankingScoreDetails"]
    assert details["rating:desc"]["value"] == 5


def test_chats_feature_gated(client):
    assert client.get("/chats").status == 400
    client.patch("/experimental-features", body={"chatCompletions": True})
    assert client.get("/chats").json["results"] == []
    res = client.put(
        "/chats/w1/settings", body={"source": "openAi", "apiKey": "sk-xxx"}
    )
    assert res.status == 200
    got = client.get("/chats/w1/settings").json
    # reference hide_secret (features.rs:66): keys under 10 chars mask whole
    assert got["apiKey"] == "XXX..."
    assert client.get("/chats").json["total"] == 1


def test_export_to_remote_instance(client):
    # spin up a second in-process instance over a real socket as the target
    import threading

    from meilisearch_tpu.api.app import App as App2
    from meilisearch_tpu.api.server import make_handler
    from http.server import ThreadingHTTPServer

    target_app = App2()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(target_app))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        client.add_documents("movies", [{"id": 1, "t": "x"}, {"id": 2, "t": "y"}])
        res = client.post("/export", body={"url": f"http://127.0.0.1:{port}"})
        assert res.status == 202
        task = client.wait_for_task(res.json["taskUid"])
        assert task["status"] == "succeeded", task
        assert task["details"]["exportedDocuments"] == 2
        target_app.scheduler.wait_for_all_tasks()
        assert len(target_app.scheduler.index("movies").documents) == 2
    finally:
        server.shutdown()
        target_app.scheduler.stop()


def test_tool_cli(tmp_path):
    import json

    from meilisearch_tpu import tool
    from meilisearch_tpu.engine.dumps import create_snapshot
    from meilisearch_tpu.engine.scheduler import IndexScheduler

    scheduler = IndexScheduler()
    store = IndexStore("movies", primary_key="id")
    store.add_documents([{"id": 1, "title": "x"}])
    scheduler.indexes["movies"] = store
    snap = create_snapshot(scheduler, str(tmp_path))
    scheduler.stop()

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        tool.main(["export-documents", "--snapshot", snap, "--index", "movies"])
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert json.loads(lines[0])["id"] == 1

    buf = io.StringIO()
    with redirect_stdout(buf):
        tool.main(["stats", "--snapshot", snap])
    assert "movies" in buf.getvalue()


def test_locales_validation():
    import pytest

    from meilisearch_tpu.index.store import IndexStore
    from meilisearch_tpu.search.perform import perform_search
    from meilisearch_tpu.types.errors import EngineError

    store = IndexStore("l", primary_key="id")
    store.add_documents([{"id": 1, "t": "bonjour le monde"}])
    # valid locales pass through
    res = perform_search(store, {"q": "bonjour", "locales": ["fra", "en"]})
    assert [h["id"] for h in res["hits"]] == [1]
    # unknown locale errors with the reference message shape
    with pytest.raises(EngineError) as err:
        perform_search(store, {"q": "x", "locales": ["klingon"]})
    assert err.value.code.value == "invalid_search_locales"
    # deserr-exact shape (locales.rs invalid_locales snapshot)
    assert "Unknown value `klingon` at `.locales[0]`: expected one of" in str(
        err.value
    )


def test_localized_attributes_setting_validation():
    import pytest

    from meilisearch_tpu.types.errors import EngineError
    from meilisearch_tpu.types.settings import Settings

    s = Settings()
    s.apply_json(
        {"localizedAttributes": [{"attributePatterns": ["title"], "locales": ["jpn"]}]}
    )
    assert s.localized_attributes[0]["locales"] == ["jpn"]
    with pytest.raises(EngineError) as err:
        s.apply_json(
            {"localizedAttributes": [{"attributePatterns": ["t"], "locales": ["xx"]}]}
        )
    assert err.value.code.value == "invalid_settings_localized_attributes"


def test_degraded_search_skipped_score_details():
    from meilisearch_tpu.index.store import IndexStore
    from meilisearch_tpu.search.perform import perform_search

    store = IndexStore("deg", primary_key="id")
    store.add_documents([{"id": 1, "t": "hello world"}, {"id": 2, "t": "hello"}])
    store.settings.search_cutoff_ms = 0  # always past the deadline
    res = perform_search(
        store,
        {"q": "hello", "showRankingScore": True, "showRankingScoreDetails": True},
    )
    assert res.get("degraded") is True
    for hit in res["hits"]:
        # reference score_details.rs: Skipped serializes as
        # {"skipped": {"order": 0}} with rank 0/1 -> score 0
        assert hit["_rankingScoreDetails"] == {"skipped": {"order": 0}}
        assert hit["_rankingScore"] == 0.0


def test_ssrf_guard_default_deny(monkeypatch):
    """The outbound URL policy is deny-by-default for private/loopback
    targets (reference http-client/src/policy.rs); the env var opts OUT."""
    import pytest as _pytest

    from meilisearch_tpu.types.errors import EngineError
    from meilisearch_tpu.utils.http_policy import check_url_policy

    monkeypatch.delenv("MEILI_TPU_ALLOW_LOCAL_URLS", raising=False)
    for url in (
        "http://127.0.0.1:7700/x",
        "http://localhost/x",
        "http://169.254.169.254/latest/meta-data",
        "http://10.1.2.3/",
        "http://[::1]/",
    ):
        with _pytest.raises(EngineError):
            check_url_policy(url)
    monkeypatch.setenv("MEILI_TPU_ALLOW_LOCAL_URLS", "1")
    check_url_policy("http://127.0.0.1:7700/x")
