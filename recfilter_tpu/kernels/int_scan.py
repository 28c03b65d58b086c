"""Wrapping-integer scan kernels: prefix-sum-class filters at HBM speed.

The exact integer executor (``dimfuse.apply_filter_int_exact``) is fully
general — mantissa limbs through the drop-free f32x9 tiled pipeline — but
pays ``nl × 9`` MXU products per dimension. The integer filters the
reference actually ships (summed-area tables, integral images, box via
SAT — ``tests/test_type_invariance.cpp:17-63``, ``apps/sat/sat.cpp``)
are all *unit-feedback* scans once coefficients are cast into the image
type (``lib/recfilter.cpp:324-341``): order 1 with feedback a ∈ {+1, −1}
and a single integer feed-forward tap. For those, int32 wrap-around IS
the exact semantics (mod 2³² ring), so the whole dimension pass is pure
VPU adds — no limbs, no MXU, no carry solve:

    a = +1:  y = cumsum(f·x)              (suffix-sum when anticausal)
    a = −1:  y_i = f·x_i − y_{i−1}  ⇒  y = D · cumsum(D · f·x),
             D = diag((−1)^i)            (global parity along the axis)

Each kernel holds the FULL scanned extent in VMEM (gate: extent ×
line-block × 12 B ≤ budget — 4096² easily fits), so a dimension is ONE
kernel = 2 HBM touches: in-register Hillis–Steele doubling (⌈log₂E⌉
shifted adds), all of a dimension's qualifying scans chained in VMEM,
the (−1)^i parity taken from a global iota (valid because the block
spans the axis). int16/int8 ride the same int32 kernel: truncating the
mod-2³² result to k bits equals the mod-2^k result (ring homomorphism).

Two layouts, mirroring the float executors: the trailing (lane) axis
scans as (rows, E) row blocks; any other axis scans as (P, E, W) sublane
blocks with the leading axes in the grid (``kernels/final2d.py``'s
rows-pass geometry).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024


def unit_scans_of(scan) -> list | None:
    """Decompose an (image-type-cast) scan into chained unit scans for
    the wrapping additive kernel, else None.

    Order 1 with feedback ±1 maps directly. Higher orders qualify when
    the feedback polynomial 1 − Σ aⱼ zʲ factors as (1−z)^m (1+z)^(k−m) —
    all-±1 roots, e.g. (2, −1) = double integration — each factor is one
    chained cumsum in the SAME kernel (still 2 HBM touches). Checked by
    exact integer reconstruction, not root-finding. The feed-forward tap
    must be a single integer; it rides the first factor."""
    fb = np.asarray(scan.feedback, np.float64).reshape(-1)
    ff = np.asarray(scan.feedfwd, np.float64).reshape(-1)
    if ff.shape != (1,):
        return None
    if ff[0] != np.round(ff[0]) or not (-(2 ** 31) <= ff[0] < 2 ** 31):
        return None
    k = fb.shape[0]
    if not 1 <= k <= 8 or np.any(fb != np.round(fb)):
        return None
    # want poly(z) = 1 - a1 z - ... - ak z^k == (1-z)^m (1+z)^(k-m)
    target = np.concatenate([[1.0], -fb])
    f, causal = int(ff[0]), bool(scan.causal)
    for m in range(k + 1):
        poly = np.array([1.0])
        for _ in range(m):
            poly = np.convolve(poly, [1.0, -1.0])
        for _ in range(k - m):
            poly = np.convolve(poly, [1.0, 1.0])
        if np.array_equal(poly, target):
            out = ([(1, 1, causal)] * m + [(1, -1, causal)] * (k - m))
            out[0] = (f, out[0][1], causal)  # the tap rides ONE factor
            return out
    return None


def _shift_fill0(v, sh: int, axis: int, E: int, roll_mode):
    """result[i] = v[i−sh] (sh>0) or v[i−sh] with sh<0, zeros shifted in.

    ``roll_mode``: "mosaic" uses ``pltpu.roll`` + an iota mask — Mosaic
    lowers pad/slice lane shifts through expensive misaligned relayouts
    (see ``stencil2d._lane_shift``); "interp"/None use jnp (interpret
    mode and XLA-level callers, where pad/slice fuses fine)."""
    if roll_mode is None:
        # lax.pad with a negative opposite edge shifts and crops in one op
        cfg = [(0, 0, 0)] * v.ndim
        cfg[axis] = (sh, -sh, 0)
        return jax.lax.pad(v, jnp.int32(0), cfg)
    if roll_mode == "mosaic":
        rolled = pltpu.roll(v, sh % E, axis)
    else:
        rolled = jnp.roll(v, sh, axis=axis)
    pos = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    mask = pos < sh if sh > 0 else pos >= E + sh
    return jnp.where(mask, jnp.zeros_like(v), rolled)


def _apply_unit_scans(v, scans, axis: int, E: int, roll_mode=None):
    """Chain unit scans over ``axis`` of an int32 VMEM block (full extent
    E along that axis). Shared by both kernels (``roll_mode`` set) and
    XLA-level callers (``roll_mode=None``)."""
    nd = v.ndim
    for f, sgn, causal in scans:
        if sgn < 0:
            shape = [1] * nd
            shape[axis] = E
            par = (1 - 2 * (jax.lax.iota(jnp.int32, E) & 1)).reshape(shape)
            v = v * par
        if f != 1:
            v = v * jnp.int32(f)
        sh = 1
        while sh < E:
            v = v + _shift_fill0(v, sh if causal else -sh, axis, E,
                                 roll_mode)
            sh *= 2
        if sgn < 0:
            v = v * par
    return v


def _lane_kernel(x_ref, o_ref, *, scans, E, roll_mode):
    v = x_ref[:].astype(jnp.int32)
    o_ref[:] = _apply_unit_scans(v, scans, 1, E,
                                 roll_mode=roll_mode).astype(o_ref.dtype)


def _sublane_kernel(x_ref, o_ref, *, scans, E, roll_mode):
    v = x_ref[:].astype(jnp.int32)
    o_ref[:] = _apply_unit_scans(v, scans, 0, E,
                                 roll_mode=roll_mode).astype(o_ref.dtype)


def _pad_to(x, axis: int, quantum: int):
    """Pad ``axis`` up to a multiple of ``quantum`` (zeros — linear scans
    of zero lines stay zero, so the crop after the kernel is exact)."""
    n = x.shape[axis]
    rem = n % quantum
    if rem == 0:
        return x, n
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, quantum - rem)
    return jnp.pad(x, pads), n


def _blk(budget_lines: int, quantum: int, total: int) -> int:
    """Largest block ≤ budget that divides ``total`` (a multiple of
    ``quantum``), found by doubling from the quantum."""
    b = quantum
    while b * 2 <= budget_lines and total % (b * 2) == 0:
        b *= 2
    return min(b, total)


_SEG_C = 4096  # chunk extent of the segmented (3-phase) variant


def _segmented_unit_scan(x, unit, axis: int, interpret: bool):
    """One unit scan over an axis too long for the full-extent kernel:
    chunk-local scans (the full-extent kernel on reshaped chunks), a
    tiny cross-chunk carry chain in XLA, and a fused offset correction.

    Exactness: chunk-local zero-init gives y_loc; the true value is
    y_loc + a^(steps-from-entry) · y_in, and the chunk carries obey
    c_j = l_j + a^C · c_{j∓1} — with C even, a^C = 1, so the chain is a
    plain (anti)cumsum over the tiny (…, n, …) carry array. Zero-padding
    the FAR end of the scan axis is exact for both directions (zero
    state propagates zero)."""
    f, sgn, causal = unit
    nd = x.ndim
    E = x.shape[axis]
    C = _SEG_C
    n = -(-E // C)
    if n * C != E:
        pads = [(0, 0)] * nd
        pads[axis] = (0, n * C - E)
        xs = jnp.pad(x, pads)
    else:
        xs = x
    shp = xs.shape[:axis] + (n, C) + xs.shape[axis + 1:]
    xr = xs.reshape(shp)
    y = int_unit_dim_pass(xr, [unit], axis + 1, interpret)
    if y is None:
        return None
    # carries: the chunk-boundary value nearest the next chunk. NOT a
    # lane-strided slice of y (pathological relayout on TPU — measured
    # 4x off the bandwidth floor at 10M samples); the boundary value of
    # a zero-init order-1 scan is a plain weighted reduction of the
    # chunk: l = Σ_t f·a^(steps-1-t)·x_t, and with a = ±1 the weights
    # are a ±f pattern, so XLA fuses multiply+reduce into one clean pass.
    t = np.arange(C)
    expo = (C - 1 - t) if causal else t
    wts = (np.int32(f) * np.where(expo % 2 == 0, 1, sgn)).astype(np.int32)
    wshape = [1] * (nd + 1)
    wshape[axis + 1] = C
    l = jnp.sum(xr.astype(jnp.int32) * wts.reshape(wshape),
                axis=axis + 1).astype(jnp.int32)
    c = _apply_unit_scans(l, [(1, 1, causal)], axis, n)  # a^C = 1 (C even)
    zshape = list(c.shape)
    zshape[axis] = 1
    z = jnp.zeros(zshape, jnp.int32)
    if causal:
        incoming = jnp.concatenate(
            [z, jax.lax.slice_in_dim(c, 0, n - 1, axis=axis)], axis=axis)
    else:
        incoming = jnp.concatenate(
            [jax.lax.slice_in_dim(c, 1, n, axis=axis), z], axis=axis)
    incoming = jnp.expand_dims(incoming, axis + 1)
    if sgn > 0:
        corr = incoming
    else:
        # a = −1: a^(i+1) forward / a^(C−i) backward; C even makes the
        # backward exponent parity (−1)^i
        i = np.arange(C)
        pat = ((-1) ** (i + 1) if causal else (-1) ** i).astype(np.int32)
        pshape = [1] * (nd + 1)
        pshape[axis + 1] = C
        corr = incoming * pat.reshape(pshape)
    y = (y.astype(jnp.int32) + corr).astype(x.dtype).reshape(xs.shape)
    if n * C != E:
        y = jax.lax.slice_in_dim(y, 0, E, axis=axis)
    return y


def int_unit_dim_pass(x, scans, axis: int, interpret: bool):
    """All unit scans of one dimension of an integer array, exact mod 2^k.

    ``x``: any-rank integer array (int8/16/32 — computed in int32, emitted
    in ``x.dtype``); ``scans``: ``[(f, ±1, causal), ...]`` applied in
    order. Extents beyond the full-extent VMEM gate run the segmented
    3-phase variant per scan. Returns None only when no variant fits
    (caller falls back to the limb executor).
    """
    nd = x.ndim
    E = x.shape[axis]
    if E < 2:
        return x
    itemsize = 4  # compute type
    budget_lines = _VMEM_BUDGET // (E * itemsize * 3)
    if E > 65536 or budget_lines < 8 or (
            axis != nd - 1 and budget_lines < 128):
        if E <= _SEG_C:
            return None
        for unit in scans:
            x = _segmented_unit_scan(x, unit, axis, interpret)
            if x is None:
                return None
        return x
    if axis == nd - 1:
        rows = int(np.prod(x.shape[:-1], dtype=np.int64)) if nd > 1 else 1
        if rows == 0:
            return x
        xr, rows0 = _pad_to(x.reshape(rows, E), 0, 8)
        rows = xr.shape[0]
        lb = _blk(budget_lines, 8, rows)
        y = pl.pallas_call(
            partial(_lane_kernel, scans=tuple(scans), E=E,
                    roll_mode="interp" if interpret else "mosaic"),
            out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
            grid=(rows // lb,),
            in_specs=[pl.BlockSpec((lb, E), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((lb, E), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=interpret,
        )(xr)
        return y[:rows0].reshape(x.shape)

    P = int(np.prod(x.shape[:axis], dtype=np.int64))
    W = int(np.prod(x.shape[axis + 1:], dtype=np.int64))
    if P == 0 or W == 0:
        return x
    if budget_lines < 128:
        return None
    xr, W0 = _pad_to(x.reshape(P, E, W), 2, 128)
    W = xr.shape[2]
    lb = _blk(budget_lines, 128, W)
    y = pl.pallas_call(
        partial(_sublane_kernel, scans=tuple(scans), E=E,
                roll_mode="interp" if interpret else "mosaic"),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=(P, W // lb),
        in_specs=[pl.BlockSpec((None, E, lb), lambda p, l: (p, 0, l),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, E, lb), lambda p, l: (p, 0, l),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(xr)
    return y[:, :, :W0].reshape(x.shape)
