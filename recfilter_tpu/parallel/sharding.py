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
    ``all_gather`` of carries (log-depth over ICI) instead of a serial
    loop. All of a dimension's scans share ONE exchange: the cross-scan
    couplings (dimfuse's G/H identities) are folded into a combined
    device-level solve matrix, so an m-scan dimension costs one collective,
    not m.

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




# ---------------------------------------------------------------------------
# Combined per-dimension exchange: one collective for all of a dim's scans
# ---------------------------------------------------------------------------


def _apply_scan_cols(M: np.ndarray, scan, seg: int) -> np.ndarray:
    """Apply ``scan`` (zero border) down the columns of a (seg, q) block —
    host-side, used to evolve segment-level correction columns."""
    from .. import scan_core

    return scan_core.oracle_apply_scan(
        M, 0, scan.causal, scan.feedfwd, list(scan.feedback), "zero"
    )


def _segment_dim_mats(scans, seg: int, D: int):
    """Device-level matrices for the combined exchange — the dimfuse algebra
    with "tile" = "device segment", built column-wise (never a seg×seg
    matrix): per-scan natural correction columns Rhat (seg, k_i) evolved
    through the later scans, cross-scan couplings H, and the combined
    block-triangular solve over devices (see dimfuse.combined_solve_matrix).
    """
    from .. import dimfuse

    m = len(scans)
    orders = [s.order for s in scans]
    cols = [None] * m  # RN_i evolved through scans applied so far
    H = [[None] * m for _ in range(m)]
    for i, s in enumerate(scans):
        k = s.order
        R = coeffs.state_matrix(s.feedback, seg)
        Jk = coeffs.antidiagonal(k)
        RN = R @ Jk if s.causal else R[::-1, :]
        # evolve earlier scans' columns through scan i and record couplings
        for j in range(i):
            evolved = _apply_scan_cols(cols[j], s, seg)
            if s.causal:
                H[i][j] = evolved[seg - k :, :][None]  # (1, k_i, k_j)
            else:
                H[i][j] = evolved[:k, :][None]
            cols[j] = evolved
        cols[i] = RN

    class _Shim:
        pass

    shim = _Shim()
    shim.orders = orders
    shim.H = H
    shim.CM = [dimfuse._chain_matrix(s, seg, D) for s in scans]
    CMfull = dimfuse.combined_solve_matrix(shim, D)
    Rcat = np.concatenate(cols, axis=1)  # (seg, ΣK) final-output corrections
    return CMfull, Rcat, orders


def _seq_dim_pass_combined(y, axis, spec, scan_ids, tile_width, D, name,
                           backend, interpret):
    """All of one dimension's scans with a SINGLE carry exchange.

    Each device runs the zero-state local cascade scan by scan, recording
    every scan's natural boundary carry along the way; one ``all_gather``
    moves the stacked carries; the combined device-level solve and a single
    rank-ΣK correction complete all scans at once.
    """
    scans = [spec.scans[i] for i in scan_ids]
    seg = y.shape[axis]
    CMfull, Rcat, orders = _segment_dim_mats(scans, seg, D)
    S = int(sum(orders))

    cs = []
    for idx, s in zip(scan_ids, scans):
        y = _local_apply_dim(y, spec, axis, [idx], tile_width, backend,
                             interpret)
        ym = jnp.moveaxis(y, axis, -1)
        k = s.order
        c = ym[..., seg - k :] if s.causal else ym[..., :k]
        cs.append(c)
    ccat = jnp.concatenate(cs, axis=-1)  # (..., S) natural, scan-ordered

    allc = jax.lax.all_gather(ccat, name, axis=0)  # (D, ..., S)
    d = jax.lax.axis_index(name)
    CM = jnp.asarray(CMfull, dtype=y.dtype)  # (D·S, D·S)
    # this device's row block maps ALL devices' raw carries to its N vector
    rows = jax.lax.dynamic_slice_in_dim(CM, d * S, S, axis=0)  # (S, D·S)
    flat = jnp.moveaxis(allc, 0, -2)  # (..., D, S)
    flat = flat.reshape(flat.shape[:-2] + (D * S,))
    # carry solves at true f32: XLA's default f32 dot is single-pass bf16 on
    # TPU (~1e-2 rel err), non-decaying at segment boundaries for integrators
    prec = jax.lax.Precision.HIGHEST
    N = jnp.einsum("sz,...z->...s", rows, flat, precision=prec)
    corr = jnp.einsum("tk,...k->...t", jnp.asarray(Rcat, dtype=y.dtype), N,
                      precision=prec)
    ym = jnp.moveaxis(y, axis, -1) + corr
    return jnp.moveaxis(ym, -1, axis)


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

    int_dtype = jnp.issubdtype(jnp.dtype(spec.dtype), jnp.integer)
    if int_dtype and seq_axis in scanned:
        # The carry-exchange correction is float math; integer specs are
        # exact only through the scan_core path. Shard lines/batch instead.
        raise NotImplementedError(
            "sharding a scanned dimension of an integer-dtype filter is not "
            "supported (the carry correction is float); shard over "
            "non-scanned (line/batch) axes, which run the exact integer path"
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

    if int_dtype:
        # Exact integer local scans (data/batch sharding only).
        from .. import scan_core

        def local_int(xl):
            return scan_core.apply_filter(spec, xl)

        fn = jax.shard_map(
            local_int, mesh=mesh, in_specs=(pspec,), out_specs=pspec,
            check_vma=False,
        )
        return fn(x)

    def local_fn(xl):
        y = xl.astype(jnp.float32)
        for ax, ids in spec.scans_by_axis().items():
            T = tiles[ax] or 32
            T = min(T, y.shape[ax])
            name, D = shard_of.get(ax, (None, 1))
            if D > 1:
                # Scanned axis is sharded: one combined carry exchange
                # completes ALL of the dimension's scans (the dimfuse
                # algebra at device level; one all_gather instead of one
                # per scan).
                y = _seq_dim_pass_combined(
                    y, ax, spec, ids, T, D, name, backend, interpret
                )
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
