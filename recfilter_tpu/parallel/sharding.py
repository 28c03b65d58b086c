"""Multi-chip execution: mesh planning and carry-exchange sequence parallelism.

The reference is single-device (no NCCL/MPI anywhere; SURVEY §2.6) — this
module is the capability it lacks, built the TPU way:

  * **data parallelism** — lines/channels/batch sharded over a mesh axis;
    scans never cross lines, so no communication at all.
  * **sequence parallelism over the scan dimension** — the overlapped-tiling
    algebra applied at pod scale: each device runs its local blocked scans
    with zero incoming state, devices exchange only their order-k boundary
    carries (k·lines floats — tiny vs the data), and a rank-k correction
    completes the local segments. This is ``lib/split.cpp``'s tile algebra
    with "tile" = "device segment" and the carry recurrence solved from an
    ``all_gather`` of carries (log-depth over ICI) instead of a serial loop.

Everything is built on ``shard_map`` over a ``jax.sharding.Mesh`` so the same
code runs on a real pod slice or on the 8-virtual-device CPU mesh used in
tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import coeffs
from ..planner import Plan
from ..spec import BorderMode, FilterSpec


def make_mesh(
    shape: Sequence[int], axis_names: Sequence[str], devices=None
) -> Mesh:
    """Build a Mesh from the first prod(shape) available devices."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {n} devices, have {len(devices)}"
        )
    arr = np.array(devices[:n]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


# ---------------------------------------------------------------------------
# Device-level carry algebra (segment ≙ tile, device ≙ tile index)
# ---------------------------------------------------------------------------


def _device_chain(feedback, seg_width: int, num_devices: int, causal: bool):
    """Per-scan static matrices for cross-device carry completion.

    Returns (RN_dev, C):
      RN_dev (seg_width, k): correction matrix, natural order, direction baked
      C (D, D, k, k): C[d, i] maps device i's natural boundary carry to
        device d's incoming true state; zero where no dependence.
    Natural carries match the kernel convention: causal → last k outputs
    ascending; anticausal → first k outputs ascending.
    """
    k = len(tuple(feedback))
    D = int(num_devices)
    W = coeffs.tail_weight_matrix(feedback, seg_width)  # true-state space
    Jk = coeffs.antidiagonal(k)
    R = coeffs.state_matrix(feedback, seg_width)
    powers = [np.eye(k)]
    for _ in range(D):
        powers.append(W @ powers[-1])
    C = np.zeros((D, D, k, k))
    if causal:
        RN = R
        for d in range(D):
            for i in range(d):
                C[d, i] = powers[d - 1 - i] @ Jk
    else:
        RN = R[::-1, :]
        # The natural first-k-ascending carry IS the true-state vector in
        # flipped coordinates (the two reversals cancel), so no Jk here.
        for d in range(D):
            for i in range(d + 1, D):
                C[d, i] = powers[i - 1 - d]
    return RN, C


def _seq_scan_local(y_loc, axis, scan, seg_width, num_devices, axis_name):
    """Inside shard_map: complete one scan across the ``axis_name`` mesh axis.

    ``y_loc`` is the device-local result of the scan run with zero incoming
    state. Exchanges order-k carries and applies the rank-k correction.
    """
    k = scan.order
    RN, C = _device_chain(scan.feedback, seg_width, num_devices, scan.causal)
    RN = jnp.asarray(RN, dtype=y_loc.dtype)
    C = jnp.asarray(C, dtype=y_loc.dtype)

    ym = jnp.moveaxis(y_loc, axis, -1)  # (..., seg)
    if scan.causal:
        c = ym[..., seg_width - k :]
    else:
        c = ym[..., :k]
    # (D, ..., k) — tiny: k values per line per device.
    allc = jax.lax.all_gather(c, axis_name, axis=0)
    d = jax.lax.axis_index(axis_name)
    Crow = jnp.take(C, d, axis=0)  # (D, k, k)
    s = jnp.einsum("dij,d...j->...i", Crow, allc)  # incoming true state
    corr = jnp.einsum("tk,...k->...t", RN, s)
    return jnp.moveaxis(ym + corr, -1, axis)


def _local_apply_dim(x, spec, axis, scan_ids, tile_width, backend, interpret):
    """Device-local dimension pass with the chosen backend."""
    from .. import dimfuse, scan_core
    from ..kernels import fused

    if backend == "pallas":
        return fused.apply_dim(x, spec, axis, scan_ids, tile_width, interpret)
    if backend == "einsum" and tile_width:
        return dimfuse.fused_dim_pass(
            x, axis, [spec.scans[i] for i in scan_ids], tile_width, spec.border
        )
    for i in scan_ids:
        s = spec.scans[i]
        x = scan_core.apply_scan(
            x, s.axis, s.causal, s.feedfwd, s.feedback, spec.border
        )
    return x


def sharded_apply_filter(
    spec: FilterSpec,
    plan: Plan,
    mesh: Mesh,
    x,
    data_axis: Optional[int] = None,
    seq_axis: Optional[int] = None,
    data_name: str = "data",
    seq_name: str = "seq",
    backend: str = "einsum",
):
    """Run the filter on a mesh: lines over ``data_name``, the scan dimension
    over ``seq_name`` (either may be absent).

    ``data_axis``/``seq_axis`` are array-axis indices into ``x``. The seq
    dimension's extent must divide evenly across its mesh axis.
    """
    scanned = {s.axis for s in spec.scans}
    if spec.border == BorderMode.CLAMP and (
        seq_axis in scanned or data_axis in scanned
    ):
        # The edge-clamped boundary lives on the first/last device only;
        # interior devices must run pure zero-state locals. The local
        # executor applies clamp at every segment edge, which would be
        # wrong — run clamped filters with non-scanned axes sharded only.
        raise NotImplementedError(
            "sharding a scanned dimension of a clamped-border filter is "
            "not yet supported; shard over non-scanned (line/batch) axes"
        )

    ndim = x.ndim
    pspec = [None] * ndim
    shard_of = {}  # array axis -> (mesh axis name, size)
    if data_axis is not None:
        pspec[data_axis] = data_name
        shard_of[data_axis] = (data_name, mesh.shape[data_name])
    if seq_axis is not None:
        pspec[seq_axis] = seq_name
        shard_of[seq_axis] = (seq_name, mesh.shape[seq_name])
    pspec = P(*pspec)

    tiles = spec.tile_widths or (0,) * spec.ndim
    interpret = plan.interpret or jax.default_backend() != "tpu"

    def local_fn(xl):
        y = xl.astype(jnp.float32)
        for ax, ids in spec.scans_by_axis().items():
            T = tiles[ax] or 32
            T = min(T, y.shape[ax])
            name, D = shard_of.get(ax, (None, 1))
            if D > 1:
                # Scanned axis is sharded: every scan needs its order-k
                # boundary carries completed across that mesh axis.
                seg = y.shape[ax]
                for i in ids:
                    s = spec.scans[i]
                    y = _local_apply_dim(
                        y, spec, ax, [i], T, backend, interpret
                    )
                    y = _seq_scan_local(y, ax, s, seg, D, name)
            else:
                y = _local_apply_dim(y, spec, ax, ids, T, backend, interpret)
        return y.astype(jnp.dtype(spec.dtype))

    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=(pspec,), out_specs=pspec,
        check_vma=False,
    )
    return fn(x)


def make_sharded_filter(
    spec: FilterSpec,
    plan: Plan,
    mesh: Mesh,
    data_axis: Optional[int] = None,
    seq_axis: Optional[int] = None,
    backend: str = "einsum",
):
    """Jitted closure over (mesh, spec, plan) taking the global array."""

    @jax.jit
    def fn(x):
        return sharded_apply_filter(
            spec, plan, mesh, x,
            data_axis=data_axis, seq_axis=seq_axis, backend=backend,
        )

    return fn
