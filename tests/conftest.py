"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding code
compiles and executes without TPU hardware (mirrors the driver's
`dryrun_multichip` validation).
"""

import os

# The axon jax plugin is pre-imported at interpreter startup, so env vars set
# here are too late for platform selection; jax.config still works as long as
# no backend client has been created yet.
# NOT setdefault: the axon plugin env presets JAX_PLATFORMS=axon, and
# subprocesses spawned by tests (durability kill -9 servers) inherit this
# environment — with a test-modified PYTHONPATH the axon plugin can become
# unimportable in the child and 'axon' then fails to initialize.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the SSRF guard is deny-by-default; tests exercise webhooks, federation
# remotes and embedders against in-process localhost servers
os.environ.setdefault("MEILI_TPU_ALLOW_LOCAL_URLS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
