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
    # JAX's persistent compilation cache (enabled in bella_tpu/__init__
    # for the minutes-long TPU compiles) sporadically SEGFAULTS on this
    # CPU backend mid-suite while deserializing an entry
    # (compilation_cache.get_executable_and_time, exit 139) — only with
    # full-suite state, never in isolation. CPU compiles are seconds, so
    # the cache buys nothing here: disable it for tests.
    jax.config.update("jax_enable_compilation_cache", False)


def pytest_collection_modifyitems(session, config, items):
    """Run the pallas-kernel-compiling tests FIRST. XLA's CPU backend
    sporadically segfaults in backend_compile_and_load on pallas
    interpret-mode compiles late in a many-compile process (upstream
    compiler-state bug; reproduced only with full-suite state, never in
    isolation — see the subprocess-isolated tests in
    test_pallas_align.py). Alphabetical order puts those compiles after
    ~100 other tests' compiles; fronting them sidesteps the corrupted
    state deterministically."""
    front = [
        it for it in items
        if "test_pallas_align" in it.nodeid or "test_prewarm" in it.nodeid
    ]
    front_set = set(id(it) for it in front)
    rest = [it for it in items if id(it) not in front_set]
    items[:] = front + rest
