"""Test configuration: force an 8-device virtual CPU platform.

Tests run on CPU with 8 virtual devices so mesh/sharding code paths are
exercised without TPU hardware (the reference's analog is re-targeting the
same pipeline to the CPU JIT via HL_JIT_TARGET, ``scripts/profile_all.sh``).

Note: the environment's sitecustomize pins JAX_PLATFORMS to the remote TPU
platform, so a plain env var is not enough — we must override through
jax.config before any backend initializes.

On-chip smoke job (VERDICT r1 #10 — Mosaic alignment paths have no CPU
equivalent): ``RECFILTER_TEST_TPU=1 python -m pytest tests -m tpu -q``
leaves the platform on the real TPU and runs only the ``tpu``-marked tests
(each is a distinct remote compile — minutes each; keep that suite tiny).
Without the env var, ``tpu``-marked tests are skipped.
"""

import os

import pytest

TPU_JOB = bool(os.environ.get("RECFILTER_TEST_TPU"))

if not TPU_JOB:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not TPU_JOB:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on the real TPU chip (RECFILTER_TEST_TPU=1)"
    )


def pytest_collection_modifyitems(config, items):
    skip = pytest.mark.skip(
        reason="TPU smoke test — run with RECFILTER_TEST_TPU=1 -m tpu"
    )
    for item in items:
        if "tpu" in item.keywords and not TPU_JOB:
            item.add_marker(skip)
