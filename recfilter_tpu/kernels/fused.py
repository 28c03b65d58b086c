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
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import coeffs
from ..planner import Plan
from ..spec import BorderMode, FilterSpec

_VMEM_BUDGET = 10 * 1024 * 1024  # bytes for the two strip buffers


@dataclasses.dataclass(frozen=True)
class ScanMats:
    """Per-scan static matrices, already transformed for in-kernel use.

    Convention ("natural order", no in-kernel reversals):
      causal:     carry slot s = y_prev[:, T-K:] ;  y = x·Bᵀ + s·RNᵀ
      anticausal: carry slot s = y_next[:, :K]  ;  same formula with the
                  anti-diagonal transformed matrices baked in host-side.
    ``K`` is the max order over the dimension's scans; unused carry columns
    hit zero columns of RN.
    """

    causal: bool
    order: int
    B: np.ndarray  # (T, T) interior-tile impulse matrix (transformed)
    B_edge: np.ndarray  # (T, T) boundary-tile variant (== B unless clamp)
    RN: np.ndarray  # (T, K) carry-injection matrix, natural order


def prepare_scan_mats(
    feedfwd: float,
    feedback: Sequence[float],
    causal: bool,
    tile_width: int,
    max_order: int,
    clamp: bool,
) -> ScanMats:
    T, k, K = int(tile_width), len(tuple(feedback)), int(max_order)
    B = coeffs.impulse_matrix(feedfwd, feedback, T)
    Be = coeffs.impulse_matrix(feedfwd, feedback, T, clamp_border=True) if clamp else B
    R = coeffs.state_matrix(feedback, T)  # (T, k), s[j] = v[-1-j]
    RN = np.zeros((T, K), dtype=np.float64)
    if causal:
        # s_nat[j] = y_prev[T-K+j]; true taps are the last k slots.
        RN[:, K - k :] = R[:, ::-1]
    else:
        # Anti-diagonal transform J·M·J / J·R (lib/coefficients.cpp:119-128).
        B = B[::-1, ::-1].copy()
        Be = Be[::-1, ::-1].copy()
        # s_nat[j] = y_next[j]; true taps are the first k slots.
        RN[:, :k] = R[::-1, :]
    return ScanMats(causal=causal, order=k, B=B, B_edge=Be, RN=RN)


def _dim_pass_mats(spec: FilterSpec, scan_ids: Sequence[int], tile_width: int):
    scans = [spec.scans[i] for i in scan_ids]
    K = max(s.order for s in scans)
    clamp = spec.border == BorderMode.CLAMP
    return [
        prepare_scan_mats(
            s.feedfwd, s.feedback, s.causal, tile_width, K, clamp
        )
        for s in scans
    ], K


def _apply_scans_to_buffer(o_ref, mats, stacked, n, T, K, L_batch, row_major):
    """Apply every scan (static unroll) to the strip held in ``o_ref``.

    ``row_major``: strip is (L, n*T), scan along lanes; else (n*T, L), scan
    along sublanes. ``stacked`` holds per-scan (B, B_edge, RN) refs.
    """
    B_ref, Be_ref, RN_ref = stacked
    for si, m in enumerate(mats):
        Bm = B_ref[si]
        Be = Be_ref[si]
        RN = RN_ref[si]
        edge_tile = 0 if m.causal else n - 1
        has_edge = not np.array_equal(m.B, m.B_edge)

        def body(i, carry, m=m, Bm=Bm, Be=Be, RN=RN, edge_tile=edge_tile,
                 has_edge=has_edge):
            t = i if m.causal else n - 1 - i
            off = pl.multiple_of(t * T, T)
            if has_edge:
                Bt = jnp.where(t == edge_tile, Be, Bm)
            else:
                Bt = Bm
            if row_major:
                xt = o_ref[:, pl.ds(off, T)]
                y = jnp.dot(xt, Bt.T, preferred_element_type=jnp.float32)
                y = y + jnp.dot(carry, RN.T, preferred_element_type=jnp.float32)
                o_ref[:, pl.ds(off, T)] = y
                carry = y[:, T - K :] if m.causal else y[:, :K]
            else:
                xt = o_ref[pl.ds(off, T), :]
                y = jnp.dot(Bt, xt, preferred_element_type=jnp.float32)
                y = y + jnp.dot(RN, carry, preferred_element_type=jnp.float32)
                o_ref[pl.ds(off, T), :] = y
                carry = y[T - K :, :] if m.causal else y[:K, :]
            return carry

        if row_major:
            carry0 = jnp.zeros((L_batch, K), dtype=jnp.float32)
        else:
            carry0 = jnp.zeros((K, L_batch), dtype=jnp.float32)
        jax.lax.fori_loop(0, n, body, carry0)


def _row_pass_kernel(B_ref, Be_ref, RN_ref, x_ref, o_ref, *, mats, n, T, K, Lb):
    o_ref[:] = x_ref[:].astype(jnp.float32)
    _apply_scans_to_buffer(
        o_ref, mats, (B_ref, Be_ref, RN_ref), n, T, K, Lb, row_major=True
    )


def _col_pass_kernel(B_ref, Be_ref, RN_ref, x_ref, o_ref, *, mats, n, T, K, Lb):
    o_ref[0] = x_ref[0].astype(jnp.float32)
    # Views of the (1, H, Lb) block as (H, Lb).
    _apply_scans_to_buffer(
        o_ref.at[0], mats, (B_ref.at[...], Be_ref.at[...], RN_ref.at[...]),
        n, T, K, Lb, row_major=False,
    )


def _pick_line_block(w: int, lane_aligned: bool) -> int:
    per_line = w * 4 * 2  # two f32 strip buffers
    lb = _VMEM_BUDGET // max(per_line, 1)
    quantum = 128 if lane_aligned else 8
    lb = max(quantum, (lb // quantum) * quantum)
    return int(min(lb, 1024))


def _stack_mats(mats: List[ScanMats]):
    B = jnp.asarray(np.stack([m.B for m in mats]), dtype=jnp.float32)
    Be = jnp.asarray(np.stack([m.B_edge for m in mats]), dtype=jnp.float32)
    RN = jnp.asarray(np.stack([m.RN for m in mats]), dtype=jnp.float32)
    return B, Be, RN


def dim_pass_rows(x, mats: List[ScanMats], tile_width: int, interpret: bool):
    """All scans of one dimension along the LAST axis of a 2-D array (L, w)."""
    L, w = x.shape
    T = int(tile_width)
    n = w // T
    assert n * T == w, "caller must pad the scan axis to a tile multiple"
    K = mats[0].RN.shape[1]
    Lb = min(_pick_line_block(w, lane_aligned=False), _round_up(L, 8))
    grid = (pl.cdiv(L, Lb),)
    B, Be, RN = _stack_mats(mats)
    kernel = partial(_row_pass_kernel, mats=mats, n=n, T=T, K=K, Lb=Lb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((Lb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(B, Be, RN, x)


def dim_pass_cols(x, mats: List[ScanMats], tile_width: int, interpret: bool):
    """All scans of one dimension along axis -2 of a 3-D array (outer, h, L)."""
    outer, h, L = x.shape
    T = int(tile_width)
    n = h // T
    assert n * T == h, "caller must pad the scan axis to a tile multiple"
    K = mats[0].RN.shape[1]
    Lb = min(_pick_line_block(h, lane_aligned=True), _round_up(L, 128))
    grid = (outer, pl.cdiv(L, Lb))
    B, Be, RN = _stack_mats(mats)
    kernel = partial(_col_pass_kernel, mats=mats, n=n, T=T, K=K, Lb=Lb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((outer, h, L), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h, Lb), lambda o, i: (o, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, Lb), lambda o, i: (o, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(B, Be, RN, x)


def _round_up(v: int, q: int) -> int:
    return -(-v // q) * q


def apply_dim(x, spec: FilterSpec, axis: int, scan_ids, tile_width: int,
              interpret: bool):
    """Apply all scans of one dimension to an arbitrary-rank array."""
    mats, K = _dim_pass_mats(spec, scan_ids, tile_width)
    T = int(tile_width)
    w = x.shape[axis]
    n = -(-w // T)
    pad = n * T - w
    nd = x.ndim

    if pad:
        pads = [(0, 0)] * nd
        pads[axis] = (0, pad)
        # Zero padding must sit at the scan's *end*: after the array for
        # causal-only dims; we pad at the end and pre-flip anticausal work in
        # matrix space, so end-padding is only exact if no anticausal scan
        # starts there. Handle by padding then masking: see _pad_note below.
        x = jnp.pad(x, pads)

    if axis == nd - 1:
        shape = x.shape
        y = dim_pass_rows(
            x.reshape(-1, shape[-1]), mats, T, interpret
        ).reshape(shape)
    else:
        # Collapse axes before/after the scan axis.
        lead = int(np.prod(x.shape[:axis], dtype=np.int64)) if axis else 1
        trail = int(np.prod(x.shape[axis + 1 :], dtype=np.int64))
        shape = x.shape
        y = dim_pass_cols(
            x.reshape(lead, shape[axis], trail), mats, T, interpret
        ).reshape(shape)

    if pad:
        y = jax.lax.slice_in_dim(y, 0, w, axis=axis)
    return y


@partial(jax.jit, static_argnums=(0, 1))
def apply_filter(spec: FilterSpec, plan: Plan, x):
    """Fused-kernel executor: one dimension pass per scanned dim."""
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
        x = apply_dim(x, spec, axis, ids, T, interpret)
    return x.astype(dtype)
