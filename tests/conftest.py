"""Test configuration: force an 8-device virtual CPU platform.

Tests run on CPU with 8 virtual devices so mesh/sharding code paths are
exercised without TPU hardware (the reference's analog is re-targeting the
same pipeline to the CPU JIT via HL_JIT_TARGET, ``scripts/profile_all.sh``).

Note: the environment's sitecustomize pins JAX_PLATFORMS to the remote TPU
platform, so a plain env var is not enough — we must override through
jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
