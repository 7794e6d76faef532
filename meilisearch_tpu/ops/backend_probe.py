"""Fail-fast, non-blocking JAX backend probe.

`jax.default_backend()` / `jax.devices()` BLOCK FOREVER when a remote
accelerator plugin's transport is up in name but dead in practice
(observed: the tunnel relay process died mid-session and every backend
init call hung indefinitely, wedging all serving). The reference engine
treats storage/remote failures as degradation, never a hang
(RemoteAvailability backoff, meilisearch-types/src/network.rs:44); the
accelerator gets the same contract here:

  * the probe runs ONCE in a daemon thread;
  * serving-path callers never wait: while the probe is unresolved they
    see `None` ("pending") and route to the host path;
  * warm-up threads may wait (`wait_s`);
  * past `MEILI_TPU_BACKEND_PROBE_TIMEOUT` (default 60 s) an unresolved
    probe becomes a sticky "" = unavailable for the process lifetime
    (a restart re-probes).
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional

_lock = threading.Lock()
_started = False
_t0: float = 0.0
_done = threading.Event()
_result_box: list = []
_sticky: Optional[str] = None  # final verdict once decided


def _deadline_s() -> float:
    return float(os.environ.get("MEILI_TPU_BACKEND_PROBE_TIMEOUT", 60.0))


def _ensure_started() -> None:
    global _started, _t0
    with _lock:
        if _started:
            return
        _started = True
        _t0 = time.monotonic()

        def probe():
            try:
                import jax

                _result_box.append(jax.default_backend())
            except Exception:
                _result_box.append("")
            _done.set()

        threading.Thread(
            target=probe, name="jax-backend-probe", daemon=True
        ).start()


def backend_kind(wait_s: float = 0.0) -> Optional[str]:
    """The default jax backend name ("tpu", "cpu", "axon", ...), "" when
    the backend cannot initialize (broken plugin, dead transport), or
    None while the probe is still pending (treat as unavailable, do NOT
    cache). Waits at most `wait_s` — serving paths must pass 0."""
    global _sticky
    if _sticky is not None:
        return _sticky
    _ensure_started()
    if wait_s > 0:
        _done.wait(wait_s)
    if _done.is_set():
        _sticky = _result_box[0]
        return _sticky
    if time.monotonic() - _t0 > _deadline_s():
        # init is hung: unavailable for this process. The probe thread
        # stays parked on the dead transport (daemon).
        _sticky = ""
        return _sticky
    return None
