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


def _local_apply_dim(x, spec, axis, scan_ids, tile_width, backend, interpret,
                     border: Optional[str] = None):
    """Device-local dimension pass with the chosen backend.

    ``border`` overrides ``spec.border`` — the sequence-sharded clamp path
    runs zero-border locals on every device and injects the clamp response
    as a rank-1 correction on the edge device only.
    """
    import dataclasses as _dc

    from .. import dimfuse, scan_core
    from ..kernels import fused

    border = spec.border if border is None else border
    if backend == "pallas":
        if border != spec.border:
            spec = _dc.replace(spec, border=border)
        return fused.apply_dim(x, spec, axis, scan_ids, tile_width, interpret)
    if backend == "einsum" and tile_width:
        return dimfuse.fused_dim_pass(
            x, axis, [spec.scans[i] for i in scan_ids], tile_width, border
        )
    for i in scan_ids:
        s = spec.scans[i]
        x = scan_core.apply_scan(
            x, s.axis, s.causal, s.feedfwd, s.feedback, border
        )
    return x




# ---------------------------------------------------------------------------
# Combined per-dimension exchange: one collective for all of a dim's scans
# ---------------------------------------------------------------------------


def _apply_scan_cols(M: np.ndarray, scan, border: str) -> np.ndarray:
    """Apply ``scan`` down the columns of a (seg, q) block — host-side, used
    to evolve segment-level correction columns. The clamped scan is the
    linear map Bf, so clamped evolution of a correction column is just the
    clamped scan applied to it."""
    from .. import scan_core

    return scan_core.oracle_apply_scan(
        M, 0, scan.causal, scan.feedfwd, list(scan.feedback), border
    )


def _clamp_col(scan, seg: int) -> np.ndarray:
    """v = (Bf − B)·e_edge: the segment-level clamp response column.

    Every clamp contribution is proportional to the edge sample (row 0 of
    the impulse matrix has a single nonzero column), so Bf − B = v·e_edgeᵀ
    is rank-1 and the clamped local pass equals the zero-border local pass
    plus ``v ⊗ x[edge]`` — the device-level form of the first/last-tile
    matrix variants in ``lib/split.cpp:625-654``.
    """
    from .. import scan_core

    e = np.zeros((seg, 1), dtype=np.float64)
    e[0 if scan.causal else seg - 1, 0] = 1.0
    vc = _apply_scan_cols(e, scan, BorderMode.CLAMP)
    vz = _apply_scan_cols(e, scan, BorderMode.ZERO)
    return (vc - vz)[:, 0]


def _segment_dim_mats(scans, seg: int, D: int, clamp: bool = False):
    """Device-level matrices for the combined exchange — the dimfuse algebra
    with "tile" = "device segment", built column-wise (never a seg×seg
    matrix): per-scan natural correction columns Rhat (seg, k_i) evolved
    through the later scans, cross-scan couplings H, and the combined
    block-triangular solve over devices (see dimfuse.combined_solve_matrix).

    With ``clamp``, the globally-first/last devices get distinct variants:
    correction columns evolve through the CLAMPED scan on the scan's edge
    device (Bf = B + v·e₀ᵀ, so the clamped evolution carries exactly the
    edge response of the incoming corrections). Returns ``Rcats`` stacked as
    (3, seg, ΣK) — [first, interior, last] — for per-device selection; for
    zero borders the stack is (1, seg, ΣK).
    """
    from .. import dimfuse

    m = len(scans)
    orders = [s.order for s in scans]

    def build(dev):
        # dev: 0 (globally first), None (interior), D-1 (globally last)
        cols = [None] * m  # RN_i evolved through scans applied so far
        H = [[None] * m for _ in range(m)]
        for i, s in enumerate(scans):
            k = s.order
            R = coeffs.state_matrix(s.feedback, seg)
            Jk = coeffs.antidiagonal(k)
            RN = R @ Jk if s.causal else R[::-1, :]
            edge = (dev == 0) if s.causal else (dev == D - 1 and dev is not None)
            border = (
                BorderMode.CLAMP if (clamp and dev is not None and edge)
                else BorderMode.ZERO
            )
            for j in range(i):
                evolved = _apply_scan_cols(cols[j], s, border)
                if s.causal:
                    H[i][j] = evolved[seg - k :, :]  # (k_i, k_j)
                else:
                    H[i][j] = evolved[:k, :]
                cols[j] = evolved
            cols[i] = RN
        Rcat = np.concatenate(cols, axis=1)  # (seg, ΣK)
        return H, Rcat

    class _Shim:
        pass

    shim = _Shim()
    shim.orders = orders
    shim.CM = [dimfuse._chain_matrix(s, seg, D) for s in scans]

    if not clamp:
        H1, Rcat = build(None)
        shim.H = [
            [(H1[i][j][None] if j < i else None) for j in range(m)]
            for i in range(m)
        ]
        CMfull = dimfuse.combined_solve_matrix(shim, D)
        return CMfull, Rcat[None], orders

    built = {0: build(0), None: build(None), D - 1: build(D - 1)}

    def h_stack(i, j):
        return np.stack(
            [built[d if d in (0, D - 1) else None][0][i][j] for d in range(D)]
        )

    shim.H = [
        [(h_stack(i, j) if j < i else None) for j in range(m)]
        for i in range(m)
    ]
    CMfull = dimfuse.combined_solve_matrix(shim, D)
    Rcats = np.stack(
        [built[0][1], built[None][1], built[D - 1][1]]
    )  # (3, seg, ΣK): [first, interior, last]
    return CMfull, Rcats, orders


def _seq_local_cascade(y, axis, spec, scan_ids, tile_width, D, name, backend,
                       interpret):
    """Zero-state local cascade on each device, scan by scan, collecting the
    natural boundary carries. Clamped borders run zero-border locals plus
    the rank-1 edge correction ``v ⊗ y_pre[edge]`` on the scan's edge device
    (see :func:`_clamp_col`); the carries then match the clamped G-tails the
    exchange matrices expect. Returns (y, ccat)."""
    scans = [spec.scans[i] for i in scan_ids]
    seg = y.shape[axis]
    clamp = spec.border == BorderMode.CLAMP
    d = jax.lax.axis_index(name)

    cs = []
    for idx, s in zip(scan_ids, scans):
        if clamp:
            edge_pos = 0 if s.causal else seg - 1
            x_edge = jax.lax.slice_in_dim(y, edge_pos, edge_pos + 1, axis=axis)
        y = _local_apply_dim(y, spec, axis, [idx], tile_width, backend,
                             interpret, border=BorderMode.ZERO)
        if clamp:
            v = _clamp_col(s, seg)
            vshape = [1] * y.ndim
            vshape[axis] = seg
            vj = jnp.asarray(v, dtype=y.dtype).reshape(vshape)
            edge_dev = 0 if s.causal else D - 1
            mask = (d == edge_dev).astype(y.dtype)
            y = y + mask * vj * x_edge
        ym = jnp.moveaxis(y, axis, -1)
        k = s.order
        c = ym[..., seg - k :] if s.causal else ym[..., :k]
        cs.append(c)
    return y, jnp.concatenate(cs, axis=-1)  # (..., S) natural, scan-ordered


def _select_rcat(Rcats: np.ndarray, D: int, d, dtype):
    """Pick this device's final-correction columns: (1|3, seg, ΣK) stacked as
    [first, interior, last] under clamp, a single shared block otherwise."""
    R = jnp.asarray(Rcats, dtype=dtype)
    if R.shape[0] == 1:
        return R[0]
    sel = jnp.where(d == 0, 0, jnp.where(d == D - 1, 2, 1))
    return jax.lax.dynamic_index_in_dim(R, sel, axis=0, keepdims=False)


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
    clamp = spec.border == BorderMode.CLAMP
    CMfull, Rcats, orders = _segment_dim_mats(scans, seg, D, clamp)
    S = int(sum(orders))

    y, ccat = _seq_local_cascade(y, axis, spec, scan_ids, tile_width, D,
                                 name, backend, interpret)

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
    Rsel = _select_rcat(Rcats, D, d, y.dtype)
    corr = jnp.einsum("tk,...k->...t", Rsel, N, precision=prec)
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
