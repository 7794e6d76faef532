"""Continuous micro-batching of concurrent search requests.

The reference serves one search per CPU core (search_queue.rs permits +
spawn_blocking); the TPU-native replacement makes BATCHES the unit of
serving: a single executor thread drains whatever requests are queued (up
to MAX_BATCH per index) and runs them through perform_search_many, whose
device-eligible queries share one device execute
(search/device_batch.py). Continuous batching means no artificial window:
under load, requests pile up while the previous batch executes and the
next batch is naturally full; a lone request executes immediately.

Only bodies whose keys are device-batchable are routed here (cheap check,
no store access); everything else takes the direct path. The waiting
request threads never hold the store lock, so the executor thread cannot
deadlock against them.
"""

from __future__ import annotations

import os
import threading
import time as _time
from typing import Any, Optional

from ..search.device_batch import MAX_BATCH


class _Pending:
    __slots__ = ("store", "body", "features", "event", "result", "error")

    def __init__(self, store, body, features):
        self.store = store
        self.body = body
        self.features = features
        self.event = threading.Event()
        self.result: Optional[dict] = None
        self.error: Optional[BaseException] = None


class SearchBatcher:
    """Adaptive host/device mode controller.

    The queue depth a gate could observe follows Little's law: at the host
    path's ~5 ms service time the queue NEVER reaches a useful batch size,
    no matter how many clients are blocked behind the single serving core
    — so a "batch when >= N queued" policy can never engage the device.
    Instead the batcher watches the ARRIVAL RATE: when it approaches the
    host path's saturation it probes device mode (forcing grouped device
    executes); the resulting higher per-request latency makes the queue
    fill (Little's law again), batches self-sustain, and the TPU serves
    while the core handles HTTP. Served-QPS is measured in both modes and
    the better one wins; probes repeat so load changes re-decide."""

    WINDOW_S = 0.005  # minimum pre-drain hold so a forming batch can fill
    # device-mode drains have a large fixed cost (~30 ms tunnel dispatch +
    # selection passes that barely shrink with B: a B=8 execute measured
    # 0.15-0.2 s vs 0.28 s at B=32 on the 1M bucket), so a fragmented
    # drain wastes most of an execute. The hold scales with the measured
    # drain duration — waiting ~15% of one drain to double its width is
    # always a win — and is capped so small corpora stay snappy.
    HOLD_FRACTION = 0.15
    HOLD_MAX_S = 0.06
    # the still-arriving check spans a full second: at 1M-doc host QPS
    # (~10/s) a 0.25 s window flickers to zero arrivals between drains
    # and every flicker reset the controller to idle mid-measurement
    RATE_WINDOW_S = 1.0
    RATE_MIN_ARRIVALS = 3  # still-arriving floor inside one rate window
    MIN_DRAIN_AVG = 1.8  # real request overlap, not one fast serial client
    MEASURE_S = 1.2  # per-mode A/B measurement slice (time floor)
    MEASURE_MIN_DRAINS = 2  # a slice must span whole drains: at large
    # corpus sizes one device execute alone exceeds MEASURE_S, and a
    # slice that catches zero completions would report 0 QPS for the
    # better mode
    MEASURE_CAP_S = 8.0  # hard stop for a measurement slice
    COMMIT_S = 8.0  # initial winner tenure (doubles to 60 s while stable)

    # two executors pipeline drains: while one blocks on a device
    # readback (store lock released, search/device_batch.py), the other
    # prepares and serves the next drain on the core
    N_EXECUTORS = 2

    def __init__(self):
        self.lock = threading.Lock()
        self.queue: list[_Pending] = []
        self.wake = threading.Event()
        self._stop = False
        self._threads: list[threading.Thread] = []
        self._arrivals: list[float] = []  # recent submit timestamps
        self.mode = "host"
        self._served: list[float] = []  # recent completion timestamps
        self._drains: list[int] = []  # recent drain sizes
        self._phase = "idle"  # idle | measure_host | measure_device | commit
        self._phase_until = 0.0
        self._phase_start = 0.0
        self._phase_served = 0
        self._phase_drains = 0
        self._skip_first_drain = False
        self._host_qps = 0.0
        self._commit_s = self.COMMIT_S
        self._last_winner = "host"
        self._drain_s = 0.25  # EWMA of device-drain duration (seeds ~1M)
        # winner memory across load episodes: (store id, store generation
        # era) of the last committed DEVICE win. Bursty load must not
        # re-pay the measurement ramp on every burst — a new burst on the
        # same store resumes committed-device and the normal tenure
        # expiry re-measures it (bounded staleness = COMMIT_S)
        self._resume_key = None

    def _qps(self, now: float, window: float = 1.0) -> float:
        return sum(1 for t in self._served if now - t <= window) / window

    def _ensure_thread(self):
        alive = [t for t in self._threads if t.is_alive()]
        while len(alive) < self.N_EXECUTORS:
            t = threading.Thread(
                target=self._run,
                name=f"search-batcher-{len(alive)}",
                daemon=True,
            )
            t.start()
            alive.append(t)
        self._threads = alive

    def stop(self):
        self._stop = True
        self.wake.set()

    def submit(self, store, body: dict, features=None) -> dict:
        """Queue a search and wait for its response.

        The wait is bounded but generous: a cold persistent compile cache
        means the first arena-kernel execute can spend minutes inside XLA
        (jax_setup.py measured 28-290 s per variant over the tunnel), and
        every queued request legitimately waits behind it. Only a dead
        executor thread or the hard cap raises."""
        entry = _Pending(store, body, features)
        now = _time.monotonic()
        with self.lock:
            self._ensure_thread()
            self.queue.append(entry)
            self._arrivals.append(now)
            if len(self._arrivals) > 256:
                del self._arrivals[:128]
        self.wake.set()
        deadline = _time.monotonic() + float(
            os.environ.get("MEILI_TPU_BATCHER_TIMEOUT", "900")
        )
        while not entry.event.wait(timeout=5.0):
            if _time.monotonic() > deadline:
                raise TimeoutError("search batcher timed out")
            if not any(t.is_alive() for t in self._threads):
                # executor died (interpreter teardown / unrecoverable error):
                # don't strand the caller
                if not entry.event.is_set():
                    raise TimeoutError("search batcher thread died")
        if entry.error is not None:
            raise entry.error
        return entry.result

    def _update_mode(self, now: float, recent: int, store) -> None:
        """A/B mode controller: under sustained CONCURRENT load, measure a
        host slice then a device slice with the same window and commit the
        winner for a tenure that doubles while the winner repeats. Honest
        by construction — no stale baseline, and a one-client stream of
        fast queries (high rate but avg drain ~1, which batching cannot
        help) never triggers measurement."""
        drains = self._drains[-16:]
        # "loaded" = genuine request OVERLAP (drain size > 1 means callers
        # queued while a batch executed), not a raw arrival-rate bar: a
        # slow host path (1M docs ~ 50-80 ms/query) caps the closed-loop
        # arrival rate at its own low QPS, which is exactly the regime
        # where device batching wins — an absolute rate gate could never
        # engage there.
        loaded = (
            len(drains) >= 8
            and sum(drains) / len(drains) >= self.MIN_DRAIN_AVG
            and recent >= self.RATE_MIN_ARRIVALS
        )
        if not loaded:
            recent_overlap = drains[-4:] and (
                sum(drains[-4:]) / len(drains[-4:]) >= 1.5
            )
            if recent < self.RATE_MIN_ARRIVALS and not recent_overlap:
                # load gone: reset to host + fresh measurement next time.
                # The drain-overlap guard matters in device mode: a big
                # drain absorbs every blocked client, so arrivals pause
                # during the execute and burst after it — a raw arrival
                # trickle at that instant is not "load gone".
                if self._phase != "idle" or self.mode != "host":
                    self._trace(
                        f"load gone (recent={recent}): reset from"
                        f" {self._phase}/{self.mode}"
                    )
                    if self._phase == "commit" and self.mode == "device":
                        # keyed on the index uid, not id(store): object
                        # ids get recycled, and a reopened index with the
                        # same corpus legitimately resumes its winner
                        self._resume_key = getattr(store, "uid", None)
                self._phase = "idle"
                self.mode = "host"
                self._commit_s = self.COMMIT_S
            return
        if self._phase == "idle":
            if _device_ready(store):
                if (
                    self._resume_key is not None
                    and self._resume_key == getattr(store, "uid", None)
                ):
                    # prior burst committed device on this store: resume
                    # committed (ONE-shot — tenure expiry re-measures)
                    self._resume_key = None
                    self._trace("resume committed device (prior winner)")
                    self._last_winner = "device"
                    self.mode = "device"
                    self._phase = "commit"
                    self._phase_until = now + self.COMMIT_S
                    return
                # already serving in host mode under this same load: the
                # trailing served window IS the host baseline — skip the
                # dedicated host slice (it costs ~4 s at 1M docs)
                if self.mode == "host":
                    recent_served = sum(
                        1 for t in self._served if now - t <= 2.0
                    )
                    if recent_served >= 4:
                        self._host_qps = recent_served / 2.0
                        self._start_phase("measure_device", "device", now)
                        return
                self._start_phase("measure_host", "host", now)
        elif self._phase in ("measure_host", "measure_device"):
            phase_drains = len(self._drains) - self._phase_drains
            if (
                self._phase == "measure_device"
                and self._skip_first_drain
                and phase_drains >= 1
            ):
                # the first device drain pays one-time per-generation row
                # registration (packing (term,class) bitmaps at corpus
                # width); the mode decision must compare steady-state
                # serving, so the measurement window restarts after it
                self._skip_first_drain = False
                self._phase_start = now
                self._phase_until = now + self.MEASURE_S
                self._phase_served = len(self._served)
                self._phase_drains = len(self._drains)
                return
            # a slice ends only after spanning whole drains: at 1M docs a
            # single device execute exceeds MEASURE_S and a time-only
            # slice could catch zero completions
            done = now >= self._phase_until and (
                phase_drains >= self.MEASURE_MIN_DRAINS
                or now >= self._phase_start + self.MEASURE_CAP_S
            )
            if not done:
                return
            served = len(self._served) - self._phase_served
            qps = served / max(now - self._phase_start, 1e-6)
            if self._phase == "measure_host":
                self._host_qps = qps
                self._start_phase("measure_device", "device", now)
            else:
                winner = (
                    "device" if qps >= self._host_qps * 1.05 else "host"
                )
                self._trace(
                    f"decide: device_qps={qps:.1f} host_qps="
                    f"{self._host_qps:.1f} winner={winner}"
                    f" commit_s={self._commit_s}"
                )
                if winner == self._last_winner:
                    self._commit_s = min(self._commit_s * 2, 60.0)
                    # a decisive margin earns max tenure immediately — but
                    # only for a REPEATED winner: one noisy slice on a
                    # fresh flip must not lock a possibly-wrong mode for a
                    # full 60 s. Each re-measurement serves
                    # MEASURE_S..MEASURE_CAP_S at the LOSER's rate (at 1M
                    # the host slice runs ~17 QPS vs ~150 device), so
                    # re-deciding a 5x-win every 8 s taxes throughput ~20%
                    lo, hi = sorted((qps, self._host_qps))
                    if lo > 0 and hi / lo >= 3.0:
                        self._commit_s = 60.0
                else:
                    self._commit_s = self.COMMIT_S
                self._last_winner = winner
                self.mode = winner
                self._phase = "commit"
                self._phase_until = now + self._commit_s
        elif now >= self._phase_until:  # commit expired: re-measure
            self._phase = "idle"

    def _trace(self, msg: str) -> None:
        if os.environ.get("MEILI_TPU_BATCHER_TRACE") == "1":
            import sys

            print(
                f"[batcher +{_time.monotonic():.2f}] {msg}",
                file=sys.stderr,
                flush=True,
            )

    def _start_phase(self, phase: str, mode: str, now: float) -> None:
        self._trace(
            f"phase {self._phase}->{phase} mode {self.mode}->{mode}"
            f" host_qps={self._host_qps:.1f}"
        )
        self._phase = phase
        self.mode = mode
        self._phase_start = now
        self._phase_until = now + self.MEASURE_S
        self._phase_served = len(self._served)
        self._phase_drains = len(self._drains)
        self._skip_first_drain = phase == "measure_device"

    def _run(self):
        from ..search.device_batch import _stats_add, consume_device_exec_s
        from ..search.perform import perform_search_many

        while not self._stop:
            self.wake.wait(timeout=1.0)
            with self.lock:
                if not self.queue:
                    self.wake.clear()
                    continue
                now = _time.monotonic()
                recent = sum(
                    1 for t in self._arrivals if now - t <= self.RATE_WINDOW_S
                )
                store_hint = self.queue[0].store
                # under self.lock: two executor threads share one
                # controller state machine
                self._update_mode(now, recent, store_hint)
            # the pre-drain hold only pays off when a device execute will
            # amortize it; in host mode it is pure added latency (measured:
            # it doubled serial p50). In device mode the hold is adaptive:
            # keep waiting in small slices while the batch is still
            # filling, up to HOLD_FRACTION of one measured drain (clients
            # unblocked by the previous drain need a few ms of the shared
            # core to resubmit; measured at 1M this turned B=4..15
            # fragments into full 32-wide drains).
            if self.mode == "device" and len(self.queue) < MAX_BATCH:
                cap = min(self._drain_s * self.HOLD_FRACTION, self.HOLD_MAX_S)
                deadline = _time.monotonic() + max(cap, self.WINDOW_S)
                prev_len = len(self.queue)
                while _time.monotonic() < deadline:
                    _time.sleep(self.WINDOW_S)
                    cur_len = len(self.queue)
                    if cur_len >= MAX_BATCH:
                        break
                    if cur_len <= prev_len:
                        # batch stopped filling (closed-loop concurrency
                        # below MAX_BATCH: every blocked client already
                        # resubmitted) — holding longer is pure latency
                        break
                    prev_len = cur_len
            with self.lock:
                if not self.queue:
                    self.wake.clear()
                    continue
                batch = self.queue[:MAX_BATCH]
                del self.queue[: len(batch)]
                if not self.queue:
                    self.wake.clear()
            self._drains.append(len(batch))
            if len(self._drains) > 256:
                del self._drains[:128]
            # group by store: one perform_search_many per index
            by_store: dict[int, list[_Pending]] = {}
            for e in batch:
                by_store.setdefault(id(e.store), []).append(e)
            for entries in by_store.values():
                try:
                    device_mode = self.mode == "device"
                    consume_device_exec_s()  # reset this thread's counter
                    t_drain = _time.monotonic()
                    results = perform_search_many(
                        entries[0].store,
                        [e.body for e in entries],
                        entries[0].features,
                        force_device=device_mode,
                    )
                    if device_mode:
                        _stats_add(
                            drain_wall_s=_time.monotonic() - t_drain
                        )
                    else:
                        _stats_add(
                            host_mode_served=len(entries),
                            host_mode_drains=1,
                        )
                    # only feed the EWMA when a device execute actually
                    # ran: force_device can still serve on the host (cold
                    # kernels, device exception fallback, sort/distinct
                    # re-runs), and a 32-query host drain at 1M docs takes
                    # seconds — poison for the hold heuristic
                    if (
                        device_mode
                        and len(entries) > 1
                        and consume_device_exec_s() > 0.0
                    ):
                        dt = _time.monotonic() - t_drain
                        self._drain_s = 0.7 * self._drain_s + 0.3 * dt
                    for e, r in zip(entries, results):
                        e.result = r
                except BaseException as err:  # noqa: BLE001 — relayed to callers
                    for e in entries:
                        e.error = err
                done_at = _time.monotonic()
                for e in entries:
                    e.event.set()
                    self._served.append(done_at)
            if len(self._served) > 4096:
                del self._served[:2048]


def _device_ready(store) -> bool:
    try:
        from ..search.device_batch import device_batch_enabled, warm_kernels

        return device_batch_enabled() and warm_kernels(store, wait=False)
    except Exception:
        return False


def microbatch_enabled() -> bool:
    return os.environ.get("MEILI_TPU_MICROBATCH", "1") == "1"


def batchable_body(body: dict) -> bool:
    from ..search.perform import _DEVICE_BATCH_SAFE_KEYS

    return set(body) <= _DEVICE_BATCH_SAFE_KEYS and (
        body.get("matchingStrategy") in (None, "last", "all")
    )
