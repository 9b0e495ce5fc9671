"""Backend selection helper for CLI scripts.

The build image's sitecustomize imports jax at interpreter startup with
the axon TPU platform latched into the config default, so setting
JAX_PLATFORMS later has no effect; jax.config.update does.  Scripts call
maybe_force_platform() first thing so DDDPM_PLATFORM=cpu (used by the
CLI integration tests) or =tpu works regardless.
"""
from __future__ import annotations

import os


def maybe_force_platform():
    platform = os.environ.get("DDDPM_PLATFORM")
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
    if platform == "cpu" and "DDDPM_CPU_DEVICES" in os.environ:
        n = os.environ["DDDPM_CPU_DEVICES"]
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={n}".strip())
