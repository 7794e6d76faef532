"""Shared JAX runtime configuration for the device kernels.

Enables the persistent XLA compilation cache so each (shape-bucket) kernel
variant compiles once per machine rather than once per process — on the
tunneled TPU backend a single compile costs 28-290 s, which is the main
blocker for the batched device path (ops/batch_scorer.py). The cache dir
is overridable with MEILI_TPU_COMPILE_CACHE (set to "0" to disable)."""

from __future__ import annotations

import os

_configured = False


def configure_jax() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    cache_dir = os.environ.get("MEILI_TPU_COMPILE_CACHE")
    if cache_dir == "0":
        return
    # CPU backends compile fast and their AOT artifacts are machine-feature
    # specific (a cached artifact from another host warns about SIGILL risk);
    # only the slow-to-compile accelerator backends use the persistent cache
    platform_hint = (
        os.environ.get("JAX_PLATFORMS", "")
        + " "
        + os.environ.get("JAX_PLATFORM_NAME", "")
    ).lower()
    if "cpu" in platform_hint:
        return
    if not cache_dir:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "meilisearch_tpu", "xla"
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
