"""Unit tests for the SearchBatcher A/B mode controller (engine/batcher.py).

The controller must engage its host-vs-device measurement under real
request OVERLAP — including the slow-host regime where the closed-loop
arrival rate is capped at the host's own low QPS (1M-doc corpora), which
is exactly where device batching wins — and must never engage for a
single fast serial client (drain average ~1, batching cannot help).
"""

import meilisearch_tpu.engine.batcher as batcher_mod
from meilisearch_tpu.engine.batcher import SearchBatcher


def make_batcher(drains, arrivals_per_window=3):
    b = SearchBatcher.__new__(SearchBatcher)
    SearchBatcher.__init__(b)
    b._drains = list(drains)
    return b


def test_slow_host_overlap_engages_measurement(monkeypatch):
    """1M-doc regime: ~12 QPS host => ~3 arrivals per 0.25 s window, but
    32 blocked clients => large drains. The controller must start
    measuring (the old absolute arrival-rate gate never could)."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8, 12, 16, 10, 9, 14, 11, 13])
    b._update_mode(now=100.0, recent=3, store=None)
    assert b._phase == "measure_host"
    assert b.mode == "host"


def test_fast_serial_client_never_measures(monkeypatch):
    """One fast client: high arrival rate but drain average ~1 — batching
    cannot help, the controller must stay idle in host mode."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([1, 1, 1, 1, 1, 1, 1, 1, 2, 1])
    b._update_mode(now=100.0, recent=40, store=None)
    assert b._phase == "idle"
    assert b.mode == "host"


def test_measurement_slice_waits_for_whole_drains(monkeypatch):
    """A slice only ends after MEASURE_MIN_DRAINS drains completed in it:
    at 1M docs one device execute exceeds MEASURE_S and a time-only slice
    could catch zero completions and report 0 QPS."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8] * 8)
    b._update_mode(now=100.0, recent=3, store=None)
    assert b._phase == "measure_host"
    # time expired but no drain completed in the phase -> keep measuring
    b._update_mode(now=100.0 + b.MEASURE_S + 0.1, recent=3, store=None)
    assert b._phase == "measure_host"
    # two drains land -> the phase may end at the next tick
    b._drains += [8, 8]
    b._served += [101.0] * 16
    b._update_mode(now=100.0 + b.MEASURE_S + 0.2, recent=3, store=None)
    assert b._phase == "measure_device"
    assert b.mode == "device"
    assert b._skip_first_drain


def test_first_device_drain_excluded_from_measurement(monkeypatch):
    """The first device drain pays one-time per-generation row
    registration (measured ~4 s at 1M docs vs 0.44 s steady) — the mode
    decision must not count it, or the device loses every A/B at exactly
    the corpus sizes where it wins."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8] * 8)
    now = 100.0
    b._update_mode(now=now, recent=3, store=None)
    now += b.MEASURE_S + 0.1
    b._drains += [2, 2]
    b._served += [now] * 4
    b._update_mode(now=now, recent=3, store=None)
    assert b._phase == "measure_device"
    # a slow cold drain lands; the window must restart, not conclude
    now += 5.0
    b._drains += [32]
    b._served += [now] * 32
    served_before = b._phase_served
    b._update_mode(now=now, recent=3, store=None)
    assert b._phase == "measure_device"
    assert not b._skip_first_drain
    assert b._phase_start == now
    assert b._phase_served == len(b._served) > served_before


def test_measurement_slice_hard_cap(monkeypatch):
    """A mode that never completes a drain inside MEASURE_CAP_S still ends
    its slice (0 QPS measured) instead of wedging the controller."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8] * 8)
    b._update_mode(now=100.0, recent=3, store=None)
    assert b._phase == "measure_host"
    b._update_mode(now=100.0 + b.MEASURE_CAP_S + 0.1, recent=3, store=None)
    assert b._phase == "measure_device"


def test_device_wins_and_commit_tenure_doubles(monkeypatch):
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8] * 8)
    now = 100.0
    b._update_mode(now=now, recent=3, store=None)

    # host slice: 2 drains, 4 requests served over ~1.3 s (~3 QPS)
    now += b.MEASURE_S + 0.1
    b._drains += [2, 2]
    b._served += [now] * 4
    b._update_mode(now=now, recent=3, store=None)
    assert b._phase == "measure_device"

    # first device drain: warm-up, restarts the window
    now += 0.5
    b._drains += [20]
    b._served += [now] * 20
    b._update_mode(now=now, recent=3, store=None)
    assert b._phase == "measure_device"

    # device slice: 2 drains, 6 requests served (~4.6 QPS — a NON-decisive
    # 1.5x win; a >= 3x margin takes the long-tenure fast path instead,
    # covered by test_decisive_margin_earns_long_tenure)
    now += b.MEASURE_S + 0.1
    b._drains += [3, 3]
    b._served += [now] * 6
    b._update_mode(now=now, recent=3, store=None)
    assert b._phase == "commit"
    assert b.mode == "device"

    # commit expires -> re-measure -> device wins again -> tenure doubled
    first_tenure = b._commit_s
    now = b._phase_until + 0.1
    b._update_mode(now=now, recent=3, store=None)
    assert b._phase == "idle"
    b._update_mode(now=now, recent=3, store=None)
    now += b.MEASURE_S + 0.1
    b._drains += [2, 2]
    b._served += [now] * 4
    b._update_mode(now=now, recent=3, store=None)
    now += 0.5
    b._drains += [20]
    b._served += [now] * 20
    b._update_mode(now=now, recent=3, store=None)
    now += b.MEASURE_S + 0.1
    b._drains += [3, 3]
    b._served += [now] * 6
    b._update_mode(now=now, recent=3, store=None)
    assert b.mode == "device"
    assert b._commit_s > first_tenure


def test_decisive_margin_earns_long_tenure(monkeypatch):
    """A >= 3x winner that REPEATS commits for the maximum tenure: every
    re-measurement serves a slice at the loser's rate (at 1M docs the
    host slice runs ~17 QPS vs ~150 device), so re-deciding a decisive
    win every 8 s taxes sustained throughput ~20%. The fast path is
    gated on a repeated winner — one noisy slice on a fresh flip must
    not lock a possibly-wrong mode for a full 60 s."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8] * 8)

    def measure_cycle(now):
        b._update_mode(now=now, recent=3, store=None)
        now += b.MEASURE_S + 0.1
        b._drains += [2, 2]
        b._served += [now] * 4
        b._update_mode(now=now, recent=3, store=None)  # host ~3 QPS
        now += 0.5
        b._drains += [20]
        b._served += [now] * 20
        b._update_mode(now=now, recent=3, store=None)  # warm-up drain
        now += b.MEASURE_S + 0.1
        b._drains += [20, 20]
        b._served += [now] * 40
        b._update_mode(now=now, recent=3, store=None)  # device ~30 QPS
        return now

    now = measure_cycle(100.0)
    assert b._phase == "commit"
    assert b.mode == "device"
    # first decisive win is still a FLIP (fresh winner): base tenure only
    assert b._commit_s == b.COMMIT_S

    # commit expires; the same decisive winner repeats -> max tenure
    now = b._phase_until + 0.1
    b._update_mode(now=now, recent=3, store=None)  # commit -> idle
    now = measure_cycle(now)
    assert b._phase == "commit"
    assert b.mode == "device"
    assert b._commit_s == 60.0


def test_host_baseline_from_trailing_window(monkeypatch):
    """When the batcher is already draining in host mode, the trailing
    served window doubles as the host measurement — measurement jumps
    straight to the device slice."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8] * 8)
    b._served = [99.5] * 24  # 24 served in the last 2 s => 12 QPS host
    b._update_mode(now=100.0, recent=3, store=None)
    assert b._phase == "measure_device"
    assert b.mode == "device"
    assert b._host_qps == 12.0


def test_controller_converges_to_device_under_slow_host_load(monkeypatch):
    """End-to-end controller simulation of the 1M-doc regime: host path
    ~60 ms/query serial, device path ~0.5 s per 32-batch. 16 closed-loop
    clients => ~16 QPS host vs ~64 QPS device. The controller must
    converge to device mode and stay there (measured through the real
    executor thread, fake search costs)."""
    import threading
    import time

    import meilisearch_tpu.search.perform as perform_mod

    store_lock = threading.Lock()  # the store's single-writer lock

    def fake_many(store, bodies, features=None, force_device=False):
        if force_device:
            # prepare (locked) then the device execute (lock released,
            # search/device_batch.py readback overlap)
            with store_lock:
                time.sleep(0.002 * len(bodies))
            time.sleep(0.2 + 0.005 * len(bodies))
        else:
            with store_lock:  # host execution holds the store lock
                time.sleep(0.03 * len(bodies))
        return [{"hits": []} for _ in bodies]

    monkeypatch.setattr(perform_mod, "perform_search_many", fake_many)
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)

    b = SearchBatcher.__new__(SearchBatcher)
    SearchBatcher.__init__(b)
    stop = time.monotonic() + 12.0
    modes_seen = []
    store = object()  # one shared index: drains group into one execute

    def client():
        while time.monotonic() < stop:
            b.submit(store, {"q": "x"})
            modes_seen.append(b.mode)

    threads = [threading.Thread(target=client) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.stop()
    # every A/B the controller ran must have picked device, and a real
    # share of requests must have been served in device mode (the exact
    # tail composition depends on where re-measurement slices land)
    assert b._last_winner == "device"
    assert modes_seen.count("device") > len(modes_seen) * 0.3, (
        modes_seen.count("device"),
        len(modes_seen),
    )


def test_load_gone_resets_to_host(monkeypatch):
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8] * 8)
    b._update_mode(now=100.0, recent=3, store=None)
    assert b._phase == "measure_host"
    # arrivals trickle AND the recent drains show no overlap -> reset
    b._drains += [1, 1, 1, 1]
    b._update_mode(now=101.0, recent=0, store=None)
    assert b._phase == "idle"
    assert b.mode == "host"


def test_arrival_pause_during_big_drain_is_not_load_gone(monkeypatch):
    """In device mode a full drain absorbs every blocked client; arrivals
    pause during the execute and burst after. The instantaneous trickle
    must not reset a committed device mode."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([32, 32, 32, 32])
    b._phase = "commit"
    b.mode = "device"
    b._phase_until = 200.0
    b._update_mode(now=101.0, recent=0, store=None)
    assert b._phase == "commit"
    assert b.mode == "device"


def test_winner_resume_skips_measurement_ramp(monkeypatch):
    """A new load burst on a store whose previous burst committed DEVICE
    resumes committed (round 5: bursty load must not re-pay the A/B
    measurement ramp every burst). One-shot: the tenure expiry after the
    resume runs a full re-measurement."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8] * 8)

    class _S:
        uid = "movies"

    store = _S()
    now = 100.0
    # drive to a committed device win
    b._update_mode(now=now, recent=3, store=store)
    now += b.MEASURE_S + 0.1
    b._drains += [2, 2]
    b._served += [now] * 4
    b._update_mode(now=now, recent=3, store=store)
    now += 0.5
    b._drains += [20]
    b._served += [now] * 20
    b._update_mode(now=now, recent=3, store=store)
    now += b.MEASURE_S + 0.1
    b._drains += [3, 3]
    b._served += [now] * 6
    b._update_mode(now=now, recent=3, store=store)
    assert (b._phase, b.mode) == ("commit", "device")

    # load disappears mid-commit: reset to host, but remember the winner
    b._arrivals.clear()
    b._drains = [1, 1, 1, 1]
    b._update_mode(now=now + 1.0, recent=0, store=store)
    assert (b._phase, b.mode) == ("idle", "host")
    assert b._resume_key == "movies"

    # load returns on the SAME store: resume committed-device immediately
    now += 10.0
    b._drains = [8] * 8
    b._update_mode(now=now, recent=3, store=store)
    assert (b._phase, b.mode) == ("commit", "device")
    assert b._resume_key is None  # one-shot

    # tenure expiry re-measures from scratch (no infinite resume loop)
    now = b._phase_until + 0.1
    b._update_mode(now=now, recent=3, store=store)
    assert b._phase == "idle"
    b._update_mode(now=now, recent=3, store=store)
    assert b._phase in ("measure_host", "measure_device")


def test_winner_resume_other_store_measures(monkeypatch):
    """The resume shortcut is per-store: a different store measures."""
    monkeypatch.setattr(batcher_mod, "_device_ready", lambda store: True)
    b = make_batcher([8] * 8)
    b._resume_key = "books"  # a different index's win

    class _S:
        uid = "movies"

    other = _S()
    b._update_mode(now=100.0, recent=3, store=other)
    assert b._phase == "measure_host"
