"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Mirrors the multi-host simulation strategy in SURVEY.md §4: sharding paths are
validated on ``--xla_force_host_platform_device_count=8`` CPU devices standing
in for a pod slice; the driver separately dry-runs the multi-chip path on the
real backend.

Note: this image's sitecustomize registers a remote TPU backend and exports
``JAX_PLATFORMS`` for it, so we must override both the env var and the live
jax config (XLA_FLAGS still has to land before first backend use).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches after each test module.

    The full slow lane in one process accumulates hundreds of compiled
    programs; at that load the XLA:CPU compiler segfaulted twice inside
    ``backend_compile_and_load`` (r05, rc=139 near the lane's end) while
    every module-level subset passes.  Bounding the in-process compiler
    state removes the trigger; cross-module executable reuse is rare, so
    the recompile cost is small.
    """
    yield
    import jax

    jax.clear_caches()
