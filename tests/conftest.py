"""Test harness: run all tests on a virtual 8-device CPU mesh.

Real TPU is exercised by bench.py and the driver's dryrun; tests use
XLA's host-platform device-count override so sharding logic is
validated without hardware (SURVEY.md section 4's proposed strategy).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already latched into the config default, so the
# env var above can be too late — force the platform via config too.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated test runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
