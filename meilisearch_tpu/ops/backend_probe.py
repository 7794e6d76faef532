"""Fail-fast JAX backend probe.

`jax.default_backend()` / `jax.devices()` BLOCK FOREVER when a remote
accelerator plugin's transport is up in name but dead in practice
(observed: the tunnel relay process died mid-session and every backend
init call hung indefinitely, wedging all serving). The reference engine
treats storage/remote failures as degradation, never a hang
(RemoteAvailability backoff, meilisearch-types/src/network.rs:44); the
accelerator gets the same contract here: probe once in a daemon thread
under a deadline, and on timeout serve on the host path for the rest of
the process lifetime (a restart re-probes).
"""

from __future__ import annotations

import os
import threading
from typing import Optional

_lock = threading.Lock()
_result: Optional[str] = None  # backend name, or "" = unavailable


def backend_kind(timeout_s: float = 60.0) -> str:
    """The default jax backend name ("tpu", "cpu", "axon", ...), or ""
    when the backend cannot initialize (broken plugin, dead tunnel).
    Blocks at most `timeout_s` (first call only; the verdict is sticky)."""
    global _result
    if _result is not None:
        return _result
    with _lock:
        if _result is not None:
            return _result
        timeout_s = float(
            os.environ.get("MEILI_TPU_BACKEND_PROBE_TIMEOUT", timeout_s)
        )
        box: list = []

        def probe():
            try:
                import jax

                box.append(jax.default_backend())
            except Exception:
                box.append("")

        t = threading.Thread(target=probe, name="jax-backend-probe", daemon=True)
        t.start()
        t.join(timeout_s)
        if box:
            _result = box[0]
        else:
            # init is hung: mark unavailable for this process. The probe
            # thread stays parked on the dead transport (daemon).
            _result = ""
        return _result
