"""Test config: run on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (the driver separately dry-runs multichip).

This environment's sitecustomize imports jax and registers a TPU ("axon")
PJRT plugin whose first backend init blocks on a network tunnel for
minutes. jax snapshots JAX_PLATFORMS at import (before conftest), so
setting the env var here is too late — update jax.config directly before
any backend is initialized.
"""

import os

_WANT_TPU = os.environ.get("BELLA_TESTS_ON_TPU") == "1"

if not _WANT_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
