"""Fused Pallas dimension-pass kernels — the hot path.

One kernel invocation applies EVERY scan of one dimension to a strip of
lines held entirely in VMEM: 2 HBM touches per pixel per dimension, no matter
how many scans that dimension has (the reference needs a kernel sequence per
scan: Intra → CTail → Final, ``lib/recfilter.cpp:932-1016``). This is the
TPU-native replacement for the whole GPU scheduling stack
(``lib/recfilter.cpp:682-870`` auto-schedules, ``lib/schedule.cpp``):

  * strip of lines  ≙ CUDA block/shared-memory placement (``compute_locally``)
  * in-VMEM tile loop with carried state ≙ the sequential inter-tile
    recurrence (``lib/split.cpp:833-845``) — exact, no associative scan
  * per-tile ``(L,T) @ (T,T)`` impulse-matrix matmul on the MXU ≙ the
    intra-tile warp scan (``lib/recfilter.cpp:825-853``)

Two kernel orientations avoid any HBM transpose:
  * row pass — scan along the LAST (lane) axis, lines on sublanes
  * col pass — scan along the second-to-last (sublane) axis, lines on lanes

Anticausal scans run inside the same kernel with anti-diagonally transformed
matrices (J·B·J, J·R — the reference's ``matrix_antidiagonal`` trick,
``lib/coefficients.cpp:119-128``) and a reversed tile loop; the HBM layout is
never flipped.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import coeffs
from ..planner import Plan
from ..spec import BorderMode, FilterSpec

# Budget for the in+out strip buffer PAIR. Pallas double-buffers both across
# grid steps (pipelining), so the real VMEM footprint is ~2x this; keep the
# total under the 16 MiB scoped-vmem limit with headroom for the matrices.
_VMEM_BUDGET = 6 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class ScanMats:
    """Per-scan static matrices, already transformed for in-kernel use.

    Convention ("natural order", no in-kernel reversals):
      causal:     carry slot s = y_prev[:, T-K:] ;  y = x·Bᵀ + s·RNᵀ
      anticausal: carry slot s = y_next[:, :K]   ;  same formula with the
                  anti-diagonal transformed matrices baked in host-side.
    ``K`` is the max order over the dimension's scans; unused carry columns
    hit zero columns of RN.
    """

    causal: bool
    order: int
    has_edge: bool
    B: np.ndarray  # (T, T) interior-tile impulse matrix (transformed)
    B_edge: np.ndarray  # (T, T) boundary-tile variant (== B unless clamp)
    RN: np.ndarray  # (T, K) carry-injection matrix, natural order
    Sel: np.ndarray  # (T, K) carry-extraction selector: carry = y · Sel


def prepare_scan_mats(
    feedfwd: float,
    feedback: Sequence[float],
    causal: bool,
    tile_width: int,
    max_order: int,
    clamp: bool,
) -> ScanMats:
    T, k, K = int(tile_width), len(tuple(feedback)), int(max_order)
    assert T >= K, "tile width must be at least the max filter order"
    B = coeffs.impulse_matrix(feedfwd, feedback, T)
    Be = (
        coeffs.impulse_matrix(feedfwd, feedback, T, clamp_border=True)
        if clamp
        else B
    )
    R = coeffs.state_matrix(feedback, T)  # (T, k), s[j] = v[-1-j]
    RN = np.zeros((T, K), dtype=np.float64)
    Sel = np.zeros((T, K), dtype=np.float64)
    if causal:
        # carry[j] = y_prev[T-K+j]; true taps are the last k slots:
        # RN[:, K-k+m] = R[:, k-1-m].
        RN[:, K - k :] = R[:, ::-1]
        for j in range(K):
            Sel[T - K + j, j] = 1.0
    else:
        # Anti-diagonal transform J·M·J / J·R (lib/coefficients.cpp:119-128).
        B = B[::-1, ::-1].copy()
        Be = Be[::-1, ::-1].copy()
        # carry[j] = y_next[j]; true taps are the first k slots.
        RN[:, :k] = R[::-1, :]
        for j in range(K):
            Sel[j, j] = 1.0
    return ScanMats(
        causal=causal, order=k, has_edge=clamp, B=B, B_edge=Be, RN=RN, Sel=Sel
    )


def _dim_pass_mats(spec: FilterSpec, scan_ids: Sequence[int], tile_width: int):
    scans = [spec.scans[i] for i in scan_ids]
    K = max(s.order for s in scans)
    clamp = spec.border == BorderMode.CLAMP
    return [
        prepare_scan_mats(s.feedfwd, s.feedback, s.causal, tile_width, K, clamp)
        for s in scans
    ], K


def _apply_scans_row(o_ref, B_ref, Be_ref, RN_ref, Sel_ref, mats, n, T, K,
                     Lb, w_real, unroll=1):
    """Apply every scan (static unroll) to the (Lb, n*T) strip in ``o_ref``,
    scanning along lanes. ``w_real`` < n*T means the tail is zero padding:
    it must be re-zeroed after each scan so later scans still see a zero
    border there (a causal scan propagates values into the padding)."""
    for si, m in enumerate(mats):
        Bm = B_ref[si]
        Be = Be_ref[si]
        RN = RN_ref[si]
        Sel = Sel_ref[si]
        edge_tile = 0 if m.causal else n - 1

        def body(i, carry, m=m, Bm=Bm, Be=Be, RN=RN, Sel=Sel,
                 edge_tile=edge_tile):
            t = i if m.causal else n - 1 - i
            off = pl.multiple_of(t * T, T)
            Bt = jnp.where(t == edge_tile, Be, Bm) if m.has_edge else Bm
            xt = o_ref[:, pl.ds(off, T)]
            y = jnp.dot(xt, Bt.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            y = y + jnp.dot(carry, RN.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            o_ref[:, pl.ds(off, T)] = y
            # Carry via selector matmul: Mosaic cannot slice the lane axis
            # at unaligned static offsets like T-K.
            return jnp.dot(y, Sel, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

        jax.lax.fori_loop(
            0, n, body, jnp.zeros((Lb, K), dtype=jnp.float32),
            unroll=min(unroll, n),
        )
        if w_real < n * T and si + 1 < len(mats):
            # Re-zero the padding via an iota mask (unaligned lane slices
            # are not expressible on TPU).
            cols = jax.lax.broadcasted_iota(jnp.int32, (Lb, n * T), 1)
            o_ref[:] = jnp.where(cols < w_real, o_ref[:], 0.0)


def _apply_scans_col(o_ref, B_ref, Be_ref, RN_ref, Sel_ref, mats, n, T, K,
                     Lb, w_real, unroll=1):
    """Same, for a (n*T, Lb) strip scanning along sublanes."""
    for si, m in enumerate(mats):
        Bm = B_ref[si]
        Be = Be_ref[si]
        RN = RN_ref[si]
        Sel = Sel_ref[si]
        edge_tile = 0 if m.causal else n - 1

        def body(i, carry, m=m, Bm=Bm, Be=Be, RN=RN, Sel=Sel,
                 edge_tile=edge_tile):
            t = i if m.causal else n - 1 - i
            off = pl.multiple_of(t * T, T)
            Bt = jnp.where(t == edge_tile, Be, Bm) if m.has_edge else Bm
            xt = o_ref[pl.ds(off, T), :]
            y = jnp.dot(Bt, xt, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            y = y + jnp.dot(RN, carry, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            o_ref[pl.ds(off, T), :] = y
            return jnp.dot(Sel.T, y, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

        jax.lax.fori_loop(
            0, n, body, jnp.zeros((K, Lb), dtype=jnp.float32),
            unroll=min(unroll, n),
        )
        if w_real < n * T and si + 1 < len(mats):
            rows = jax.lax.broadcasted_iota(jnp.int32, (n * T, Lb), 0)
            o_ref[:] = jnp.where(rows < w_real, o_ref[:], 0.0)


def _row_pass_kernel(B_ref, Be_ref, RN_ref, Sel_ref, x_ref, o_ref, *, mats,
                     n, T, K, Lb, w_real, unroll):
    o_ref[:] = x_ref[:].astype(jnp.float32)
    _apply_scans_row(
        o_ref, B_ref, Be_ref, RN_ref, Sel_ref, mats, n, T, K, Lb, w_real,
        unroll=unroll,
    )


def _col_pass_kernel(B_ref, Be_ref, RN_ref, Sel_ref, x_ref, o_ref, *, mats,
                     n, T, K, Lb, w_real, unroll):
    o_ref[:] = x_ref[:].astype(jnp.float32)
    _apply_scans_col(
        o_ref, B_ref, Be_ref, RN_ref, Sel_ref, mats, n, T, K, Lb, w_real,
        unroll=unroll,
    )


def _pick_line_block(w: int, quantum: int, limit: int, request: int = 0) -> int:
    """Strip height in lines. ``request`` (Plan.line_block, via ``vectorize``)
    overrides the auto choice but is still quantized to the layout's
    alignment and clamped to the VMEM budget."""
    per_line = w * 4 * 2  # two f32 strip buffers
    lb = _VMEM_BUDGET // max(per_line, 1)
    if request:
        lb = min(lb, request)
    lb = max(quantum, (lb // quantum) * quantum)
    return int(min(lb, 1024, limit))


def _stack_mats(mats: List[ScanMats]):
    # numpy operand constants on purpose (completion._split_const's note:
    # jnp constants bound to pallas_call leak under shard_map grad)
    B = np.stack([m.B for m in mats]).astype(np.float32)
    Be = np.stack([m.B_edge for m in mats]).astype(np.float32)
    RN = np.stack([m.RN for m in mats]).astype(np.float32)
    Sel = np.stack([m.Sel for m in mats]).astype(np.float32)
    return B, Be, RN, Sel


def dim_pass_rows(x, mats: List[ScanMats], tile_width: int, interpret: bool,
                  w_real: int = 0, line_block: int = 0, unroll: int = 1):
    """All scans of one dimension along the LAST axis of a 2-D array (L, w)."""
    L, w = x.shape
    w_real = w_real or w
    T = int(tile_width)
    n = w // T
    assert n * T == w, "caller must pad the scan axis to a tile multiple"
    K = mats[0].RN.shape[1]
    Lb = _pick_line_block(w, quantum=8, limit=L, request=line_block)
    B, Be, RN, Sel = _stack_mats(mats)
    kernel = partial(
        _row_pass_kernel, mats=mats, n=n, T=T, K=K, Lb=Lb, w_real=w_real,
        unroll=max(int(unroll), 1),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, w), jnp.float32),
        grid=(pl.cdiv(L, Lb),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((Lb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(B, Be, RN, Sel, x)


def dim_pass_cols(x, mats: List[ScanMats], tile_width: int, interpret: bool,
                  w_real: int = 0, line_block: int = 0, unroll: int = 1):
    """All scans of one dimension along axis -2 of a 3-D array (outer, h, L)."""
    outer, h, L = x.shape
    w_real = w_real or h
    T = int(tile_width)
    n = h // T
    assert n * T == h, "caller must pad the scan axis to a tile multiple"
    K = mats[0].RN.shape[1]
    Lb = _pick_line_block(h, quantum=128, limit=max(L, 128), request=line_block)
    Lb = min(Lb, _round_up(L, 128)) if L >= 128 else L
    B, Be, RN, Sel = _stack_mats(mats)
    kernel = partial(
        _col_pass_kernel, mats=mats, n=n, T=T, K=K, Lb=Lb, w_real=w_real,
        unroll=max(int(unroll), 1),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((outer, h, L), jnp.float32),
        grid=(outer, pl.cdiv(L, Lb)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, h, Lb), lambda o, i: (o, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, h, Lb), lambda o, i: (o, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(B, Be, RN, Sel, x)


def _round_up(v: int, q: int) -> int:
    return -(-v // q) * q


def apply_dim(x, spec: FilterSpec, axis: int, scan_ids, tile_width: int,
              interpret: bool, line_block: int = 0, unroll: int = 1):
    """Apply all scans of one dimension to an arbitrary-rank array.

    Non-dividing extents are zero-padded at the end, which is exact for ZERO
    borders in both directions (padding only ever contributes zeros). CLAMP
    borders with a non-dividing extent would move the clamped edge into the
    padding, so that combination falls back to the einsum tiled path (which
    flips physically and pads on the always-safe side).
    """
    from .. import tiling

    nd0 = x.ndim
    w = x.shape[axis]
    T = int(tile_width)
    if axis == nd0 - 1:
        # Lane-axis dynamic slices must be 128-aligned on TPU (Mosaic), so
        # the row pass uses 128-wide tiles regardless of the requested split.
        T = 128 if not interpret else max(T, 1)
    else:
        # Sublane-axis slices need 8-alignment for f32.
        T = max(8, _round_up(T, 8)) if not interpret else max(T, 1)
    T = min(T, _round_up(w, T))
    n = -(-w // T)
    pad = n * T - w

    if pad and spec.border == BorderMode.CLAMP:
        for i in scan_ids:
            s = spec.scans[i]
            x = tiling.tiled_apply_scan(
                x, s.axis, s.causal, s.feedfwd, s.feedback, T, spec.border
            )
        return x

    mats, K = _dim_pass_mats(spec, scan_ids, T)
    nd = x.ndim
    if pad:
        pads = [(0, 0)] * nd
        pads[axis] = (0, pad)
        x = jnp.pad(x, pads)

    if axis == nd - 1:
        shape = x.shape
        y = dim_pass_rows(
            x.reshape(-1, shape[-1]), mats, T, interpret, w_real=w,
            line_block=line_block, unroll=unroll,
        ).reshape(shape)
    else:
        lead = int(np.prod(x.shape[:axis], dtype=np.int64)) if axis else 1
        trail = int(np.prod(x.shape[axis + 1 :], dtype=np.int64))
        shape = x.shape
        y = dim_pass_cols(
            x.reshape(lead, shape[axis], trail), mats, T, interpret, w_real=w,
            line_block=line_block, unroll=unroll,
        ).reshape(shape)

    if pad:
        y = jax.lax.slice_in_dim(y, 0, w, axis=axis)
    return y


@partial(jax.jit, static_argnums=(0, 1))
def apply_filter(spec: FilterSpec, plan: Plan, x):
    """Fused-kernel executor: one dimension pass per scanned dim.

    Scans are grouped by dimension (cross-dimension scans commute —
    ``group_scans_by_dimension``, ``lib/split.cpp:215-242``) and each group
    runs as a single fused kernel."""
    from .. import scan_core

    dtype = jnp.dtype(spec.dtype)
    if jnp.issubdtype(dtype, jnp.integer):
        return scan_core.apply_filter(spec, x)
    interpret = plan.interpret or jax.default_backend() != "tpu"
    x = x.astype(jnp.float32)
    tiles = spec.tile_widths or (0,) * spec.ndim
    for axis, ids in spec.scans_by_axis().items():
        T = tiles[axis]
        if not T:
            from ..planner import default_tile_width

            T = default_tile_width(spec.dims[axis].extent, jax.default_backend())
        x = apply_dim(x, spec, axis, ids, T, interpret,
                      line_block=plan.line_block, unroll=plan.unroll)
    return x.astype(dtype)
