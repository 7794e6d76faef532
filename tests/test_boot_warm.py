"""Cold-start contract (--experimental-boot-warm-sync): a packed-checkpoint
boot followed by boot_warm_sync leaves every loaded index serving warm —
host caches packed AND the device batch kernels compiled — before the
socket would open, in single-digit seconds when the XLA compile cache is
hot. CPU backend here via MEILI_TPU_DEVICE_STRICT (which warm_kernels now
honors so this contract is CI-checkable without a TPU); the tunneled-TPU
cache-cold number is published by bench.py as cold_boot_to_device_s.
Reference analogue: lib.rs binds the socket only after
open_or_create_database finishes — boot is ready-or-absent, never
silently degraded."""

import time

import pytest


@pytest.fixture(autouse=True)
def _device_strict(monkeypatch):
    monkeypatch.setenv("MEILI_TPU_DEVICE_BATCH", "1")
    monkeypatch.setenv("MEILI_TPU_DEVICE_STRICT", "1")


def _build_checkpoint(tmp_path):
    from meilisearch_tpu.api.app import App, TestClient
    from meilisearch_tpu.engine.dumps import create_packed_checkpoint

    app = App()
    client = TestClient(app)
    client.add_documents(
        "movies",
        [
            {"id": i, "title": f"quick brown film {i}", "points": i % 50}
            for i in range(300)
        ],
    )
    create_packed_checkpoint(app.scheduler, str(tmp_path))


def test_boot_warm_sync_device_ready(tmp_path, monkeypatch):
    _build_checkpoint(tmp_path)

    from meilisearch_tpu.api.app import App
    from meilisearch_tpu.engine.dumps import load_packed_checkpoint
    from meilisearch_tpu.search import device_batch
    from meilisearch_tpu.search.device_batch import serving_stats
    from meilisearch_tpu.search.perform import perform_search_many

    # one (T, B) ladder rung: production warms the full ladder (~10
    # programs, 43 s on this CPU); the boot contract under test — warm
    # covers exactly what the first drain executes — is rung-count
    # independent, and _warm_key includes the ladder so the patched
    # shape gets its own warm state
    monkeypatch.setattr(device_batch, "T_LADDER", (2,))
    monkeypatch.setattr(device_batch, "B_LADDER", (8,))

    # fresh process-analogue: new App, packed restore, synchronous warm
    app2 = App()
    t0 = time.monotonic()
    assert load_packed_checkpoint(app2.scheduler, str(tmp_path))
    app2.scheduler.boot_warm_sync()
    boot_s = time.monotonic() - t0
    # hot-compile-cache bar from VERDICT r4 #9; CPU compiles of the small
    # bucket sit well under it, so a structural regression (e.g. warm no
    # longer covering the serving bucket, first drain recompiling) shows
    # up as a hard failure rather than noise
    assert boot_s < 10.0, f"boot-to-device took {boot_s:.1f}s"

    # the FIRST real drain after warm must serve on the device path
    store = app2.scheduler.index("movies")
    serving_stats(reset=True)
    t0 = time.monotonic()
    res = perform_search_many(
        store, [{"q": "quick brown", "limit": 5}] * 4, force_device=True
    )
    first_drain_s = time.monotonic() - t0
    assert all(r is not None for r in res)
    stats = serving_stats()
    assert stats["device_served"] >= 4
    assert stats["device_errors"] == 0
    # warm did its job: the drain pays execute cost only, not a compile
    assert first_drain_s < 5.0, f"first drain took {first_drain_s:.1f}s"


def test_boot_warm_sync_never_raises_without_indexes(tmp_path):
    from meilisearch_tpu.api.app import App

    app = App()
    spent = app.scheduler.boot_warm_sync()
    assert spent >= 0.0
