"""Multi-host initialization and pod-scale mesh construction.

The reference is a single-process, single-GPU library (SURVEY §2.6 — no
NCCL/MPI anywhere); this module is the TPU-native capability it lacks: a
``jax.distributed`` entry point and mesh builders that lay the
carry-exchange (sequence) axis along ICI and the line/batch (data) axis
across DCN, so the per-dimension carry collectives ride the fast
interconnect (SURVEY §5.8 blueprint).

Single-process use (tests, the one-chip bench environment) needs no
initialization — every helper degrades to the local device set.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Bring up the multi-host runtime (idempotent).

    On TPU pods the arguments are auto-detected from the environment and
    may all be ``None``. Returns True when a multi-process runtime was (or
    already is) initialized, False when running single-process (no
    coordinator configured) — callers can proceed either way.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return True
    auto = coordinator_address is None and num_processes is None
    if auto and jax.default_backend() not in ("tpu",):
        return False  # single-process CPU/GPU dev run: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
        _initialized = True
        return True
    except (RuntimeError, ValueError):
        # already initialized by the launcher, or single-process TPU VM
        _initialized = jax.process_count() > 1
        return _initialized


def pod_mesh(
    data: int = 0,
    seq: int = 0,
    data_name: str = "data",
    seq_name: str = "seq",
    devices=None,
) -> Mesh:
    """Build a (data, seq) mesh over all devices, ICI-friendly.

    ``data``/``seq`` of 0 auto-solve: seq takes the devices of one process
    (so the latency-bound carry exchange stays on ICI within a host/slice)
    and data spans processes/slices over DCN. Pass explicit sizes to
    override. With a single process this is a plain reshape of the local
    devices.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if not data and not seq:
        seq = max(1, jax.local_device_count())
        while n % seq:
            seq //= 2
        data = n // seq
    elif not data:
        data = n // seq
    elif not seq:
        seq = n // data
    if data * seq != n:
        raise ValueError(
            f"mesh {data}x{seq} does not cover the {n} available devices"
        )
    try:
        from jax.experimental import mesh_utils

        if jax.process_count() > 1 and data % jax.process_count() == 0:
            # data axis spans processes (DCN), seq stays within a slice (ICI)
            arr = mesh_utils.create_hybrid_device_mesh(
                (data // jax.process_count(), seq),
                (jax.process_count(), 1),
                devices=devices,
            )
        else:
            arr = mesh_utils.create_device_mesh((data, seq), devices=devices)
    except Exception:
        arr = np.array(devices).reshape(data, seq)
    return Mesh(arr, (data_name, seq_name))
