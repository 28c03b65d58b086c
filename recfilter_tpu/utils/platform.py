"""Platform selection helper.

The reference selects its backend at runtime via the ``HL_JIT_TARGET`` env
var (``lib/recfilter.cpp:135-138``); the TPU build's equivalent is
``RECFILTER_PLATFORM`` (e.g. ``cpu``, ``tpu``). This must win even when a
site customization pins ``JAX_PLATFORMS``, so it goes through jax.config
before any backend initializes. Call :func:`apply_platform_env` first thing
in every runnable script.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("RECFILTER_PLATFORM", "")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        # Backends already initialized; too late to switch.
        pass
    if plat == "cpu" and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        ndev = os.environ.get("RECFILTER_CPU_DEVICES", "")
        if ndev:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={ndev}"
            ).strip()
