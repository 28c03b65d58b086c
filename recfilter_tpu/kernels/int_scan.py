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

_VMEM_BUDGET = int(__import__("os").environ.get(
    "RECFILTER_INTSCAN_VMEM", 6 * 1024 * 1024))


def _roll_mode(interpret: bool):
    """pad/slice (None) is the measured-fast in-kernel shift form; the
    roll+mask alternative stays behind RECFILTER_INTSCAN_ROLL for A/B."""
    import os

    if os.environ.get("RECFILTER_INTSCAN_ROLL", "0") == "1":
        return "interp" if interpret else "mosaic"
    return None


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

    ``roll_mode``: None uses lax.pad with a negative opposite edge —
    measured FASTER in-kernel than ``pltpu.roll`` + iota mask (4K SAT
    0.402 ms pad/slice vs ~5x slower rolls at identical blocks;
    `scripts/int_seg_probe.py` round-4 A/B — the mask adds iota+select
    VPU passes and Mosaic handles power-of-2 shifted adds well, unlike
    stencil2d's arbitrary-offset taps where roll wins). "mosaic"
    (env ``RECFILTER_INTSCAN_ROLL=1``) and "interp" keep the roll form
    for A/B."""
    if roll_mode is None:
        # positive pad + slice (Mosaic's pad lowering rejects negative
        # edges: "vector types must have positive constant sizes")
        cfg = [(0, 0, 0)] * v.ndim
        cfg[axis] = (sh, 0, 0) if sh > 0 else (0, -sh, 0)
        padded = jax.lax.pad(v, jnp.int32(0), cfg)
        lo = 0 if sh > 0 else -sh
        return jax.lax.slice_in_dim(padded, lo, lo + E, axis=axis)
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


def _seg_chunk_kernel(x_ref, y_ref, c_ref, *, C, kb, unit, roll_mode):
    """kb chunk-local scans of one (lbr, kb·C) block + their boundary
    carries: y[:, sC:(s+1)C] = scan(x-chunk), carry lane s = the
    entry-adjacent boundary value. The chunk axis rides the GRID and the
    kb slices ride one contiguous block — no leading-dim merge, so the
    caller never reshapes (XLA retiles a (rows, n, C)→(rows·n, C) merge
    physically: 4.1 ms of the 10M cumsum's 8.6 — scripts/int_trace.py).

    ``c_ref`` is a full (lbr, 128) lane tile per grid step (Mosaic's
    lane-divisibility rule); lanes ≥ kb are zero filler the caller
    strips at XLA level, where the carry array is tiny."""
    f, sgn, causal = unit
    cols = []
    for s in range(kb):
        sl = slice(s * C, (s + 1) * C)
        v = _apply_unit_scans(x_ref[:, sl].astype(jnp.int32),
                              [unit], 1, C, roll_mode=roll_mode)
        y_ref[:, sl] = v
        cols.append(v[:, C - 1:C] if causal else v[:, 0:1])
    pad = c_ref.shape[1] - kb
    if pad:
        cols.append(jnp.zeros((c_ref.shape[0], pad), jnp.int32))
    c_ref[:, :] = jnp.concatenate(cols, axis=1)


def _seg_fix_kernel(y_ref, inc_ref, o_ref, *, C, kb, sgn, causal):
    """y + a^(steps-from-entry)·incoming per chunk, same block geometry
    (incoming arrives in the same 128-lane-per-step slot layout)."""
    if sgn < 0:
        i = jax.lax.iota(jnp.int32, C).reshape(1, C)
        par = 1 - 2 * ((i + (1 if causal else 0)) & 1)
    for s in range(kb):
        sl = slice(s * C, (s + 1) * C)
        inc = inc_ref[:, s:s + 1]
        corr = inc if sgn > 0 else inc * par
        o_ref[:, sl] = y_ref[:, sl] + corr


def _seg_sub_kernel(x_ref, y_ref, c_ref, *, C, unit, roll_mode):
    """Sublane twin of :func:`_seg_chunk_kernel`: one (C, lbl) chunk
    block scanned along sublanes; the boundary carry lands in sublane 0
    of an (8, lbl) slot block (Mosaic's 8-sublane rule)."""
    f, sgn, causal = unit
    v = _apply_unit_scans(x_ref[:].astype(jnp.int32), [unit], 0, C,
                          roll_mode=roll_mode)
    y_ref[:, :] = v
    b = v[C - 1:C, :] if causal else v[0:1, :]
    c_ref[:, :] = jnp.concatenate(
        [b, jnp.zeros((7, v.shape[1]), jnp.int32)], axis=0)


def _seg_sub_fix_kernel(y_ref, inc_ref, o_ref, *, C, sgn, causal):
    if sgn < 0:
        i = jax.lax.iota(jnp.int32, C).reshape(C, 1)
        par = 1 - 2 * ((i + (1 if causal else 0)) & 1)
    inc = inc_ref[0:1, :]
    o_ref[:, :] = y_ref[:, :] + (inc if sgn > 0 else inc * par)


def _sublane_kernel(x_ref, o_ref, *, scans, E, roll_mode):
    v = x_ref[:].astype(jnp.int32)
    o_ref[:] = _apply_unit_scans(v, scans, 0, E,
                                 roll_mode=roll_mode).astype(o_ref.dtype)


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
    # Chunk extent: a multiple of the 128-lane tile that divides E when
    # possible (a non-aligned C measured 38 ms vs 5 at 10M: per-block
    # lane padding + misaligned shifts; a^C = 1 needs C even and every
    # multiple of 128 qualifies). E.g. 10M → C = 3200.
    C = _SEG_C
    for cand in range(_SEG_C, 255, -128):
        if E % cand == 0:
            C = cand
            break
    n = -(-E // C)

    if axis == nd - 1:
        # Lane-axis form: chunks ride the GRID of a 2-D kernel over the
        # UNRESHAPED array (ragged overhang masked) — a (rows, n, C)
        # merge-reshape retiles physically (xplane: 4.1 ms of 8.6 at
        # 10M). kb chunks share a block so few-row inputs still get
        # full-size DMAs; carries are a second kernel output.
        rows = int(np.prod(x.shape[:-1], dtype=np.int64)) if nd > 1 else 1
        if rows == 0:
            return x
        xr = x.reshape(rows, E)
        lbr = max(8, min(128, -(-rows // 8) * 8,
                         (_VMEM_BUDGET // (C * 4 * 3) // 8) * 8))
        kb = max(1, min(n, 128, _VMEM_BUDGET // (lbr * C * 4 * 3)))
        ngrid = -(-n // kb)
        roll = _roll_mode(interpret)
        grid = (-(-rows // lbr), ngrid)
        # carries get a full 128-lane slot per grid step (Mosaic's block
        # lane rule); the slot↔chunk gather/scatter below runs on the
        # TINY (rows, n)-scale arrays only.
        y, cs = pl.pallas_call(
            partial(_seg_chunk_kernel, C=C, kb=kb, unit=unit,
                    roll_mode=roll),
            out_shape=(jax.ShapeDtypeStruct((rows, n * C), jnp.int32),
                       jax.ShapeDtypeStruct((rows, ngrid * 128),
                                            jnp.int32)),
            grid=grid,
            in_specs=[pl.BlockSpec((lbr, kb * C), lambda r, j: (r, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((lbr, kb * C), lambda r, j: (r, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((lbr, 128), lambda r, j: (r, j),
                             memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            interpret=interpret,
        )(xr if n * C == E else jnp.pad(xr, ((0, 0), (0, n * C - E))))
        l = cs.reshape(rows, ngrid, 128)[:, :, :kb].reshape(
            rows, ngrid * kb)[:, :n]
        c = _apply_unit_scans(l, [(1, 1, causal)], 1, n)  # a^C = 1
        z = jnp.zeros((rows, 1), jnp.int32)
        if causal:
            incoming = jnp.concatenate([z, c[:, :n - 1]], axis=1)
        else:
            incoming = jnp.concatenate([c[:, 1:], z], axis=1)
        inc = jnp.pad(incoming, ((0, 0), (0, ngrid * kb - n))).reshape(
            rows, ngrid, kb)
        inc = jnp.pad(inc, ((0, 0), (0, 0), (0, 128 - kb))).reshape(
            rows, ngrid * 128)
        out = pl.pallas_call(
            partial(_seg_fix_kernel, C=C, kb=kb, sgn=sgn, causal=causal),
            out_shape=jax.ShapeDtypeStruct((rows, n * C), x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((lbr, kb * C), lambda r, j: (r, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((lbr, 128), lambda r, j: (r, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((lbr, kb * C), lambda r, j: (r, j),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            interpret=interpret,
        )(y, inc)
        if n * C != E:
            out = out[:, :E]
        return out.reshape(x.shape)

    # Sublane-axis form: same two-kernel structure over the (P, E, W)
    # view (leading-dim merges are tile-free); chunks and lane blocks in
    # the grid, carries in per-chunk 8-sublane slots.
    P = int(np.prod(x.shape[:axis], dtype=np.int64))
    W = int(np.prod(x.shape[axis + 1:], dtype=np.int64))
    if P == 0 or W == 0:
        return x
    xr = x.reshape(P, E, W)
    if n * C != E:
        xr = jnp.pad(xr, ((0, 0), (0, n * C - E), (0, 0)))
    lbl = _blk(_VMEM_BUDGET // (C * 4 * 3), 128, -(-W // 128) * 128)
    roll = _roll_mode(interpret)
    grid = (P, n, -(-W // lbl))
    y, cs = pl.pallas_call(
        partial(_seg_sub_kernel, C=C, unit=unit, roll_mode=roll),
        out_shape=(jax.ShapeDtypeStruct((P, n * C, W), jnp.int32),
                   jax.ShapeDtypeStruct((P, n * 8, W), jnp.int32)),
        grid=grid,
        in_specs=[pl.BlockSpec((None, C, lbl), lambda p, j, l: (p, j, l),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((None, C, lbl), lambda p, j, l: (p, j, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, lbl), lambda p, j, l: (p, j, l),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
        interpret=interpret,
    )(xr)
    l = cs.reshape(P, n, 8, W)[:, :, 0]                # tiny (P, n, W)
    c = _apply_unit_scans(l, [(1, 1, causal)], 1, n)   # a^C = 1 (C even)
    z = jnp.zeros((P, 1, W), jnp.int32)
    if causal:
        incoming = jnp.concatenate([z, c[:, :n - 1]], axis=1)
    else:
        incoming = jnp.concatenate([c[:, 1:], z], axis=1)
    inc = jnp.pad(incoming[:, :, None, :],
                  ((0, 0), (0, 0), (0, 7), (0, 0))).reshape(P, n * 8, W)
    out = pl.pallas_call(
        partial(_seg_sub_fix_kernel, C=C, sgn=sgn, causal=causal),
        out_shape=jax.ShapeDtypeStruct((P, n * C, W), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, C, lbl), lambda p, j, l: (p, j, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, lbl), lambda p, j, l: (p, j, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, C, lbl), lambda p, j, l: (p, j, l),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
        interpret=interpret,
    )(y, inc)
    if n * C != E:
        out = out[:, :E]
    return out.reshape(x.shape)


def int_unit_dim_pass(x, scans, axis: int, interpret: bool):
    """All unit scans of one dimension of an integer array, exact mod 2^k.

    ``x``: any-rank integer array (int8/16/32 — computed in int32, emitted
    in ``x.dtype``); ``scans``: ``[(f, ±1, causal), ...]`` applied in
    order. Extents beyond the full-extent VMEM gate run the segmented
    3-phase variant per scan. Returns None only for the awkward
    small-extent VMEM corner (caller falls back to the limb executor).
    """
    nd = x.ndim
    E = x.shape[axis]
    if E < 2:
        # extent-1 scans reduce to the feed-forward taps: y = (Π f)·x
        prod = 1
        for f, _, _ in scans:
            prod = (prod * f) & 0xFFFFFFFF
        prod = prod - (1 << 32) if prod >= (1 << 31) else prod
        if prod == 1:
            return x
        return (jnp.asarray(x).astype(jnp.int32)
                * jnp.int32(prod)).astype(x.dtype)
    itemsize = 4  # compute type
    budget_lines = _VMEM_BUDGET // (E * itemsize * 3)
    if E > 65536 or budget_lines < 8 or (
            axis != nd - 1 and budget_lines < 128):
        if E <= _SEG_C:
            return None
        for unit in scans:
            x = _segmented_unit_scan(x, unit, axis, interpret)
        return x
    # Non-dividing row/lane counts ride RAGGED grids (ceil-count, Mosaic
    # masks the overhanging block) — NO pre-pad/crop copies: the pad+crop
    # pair around a 320 MB array measured +3 ms at 10M samples while the
    # ragged kernel matched the divisible one exactly at 2.0 ms
    # (`scripts/int_kernel_probe{2,3}.py`). Rows/lanes are independent of
    # the scan axis, so overhang garbage never reaches a kept output.
    if axis == nd - 1:
        rows = int(np.prod(x.shape[:-1], dtype=np.int64)) if nd > 1 else 1
        if rows == 0:
            return x
        xr = x.reshape(rows, E)
        lb = max(8, min(512, (budget_lines // 8) * 8, -(-rows // 8) * 8))
        y = pl.pallas_call(
            partial(_lane_kernel, scans=tuple(scans), E=E,
                    roll_mode=_roll_mode(interpret)),
            out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
            grid=(-(-rows // lb),),
            in_specs=[pl.BlockSpec((lb, E), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((lb, E), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=interpret,
        )(xr)
        return y.reshape(x.shape)

    P = int(np.prod(x.shape[:axis], dtype=np.int64))
    W = int(np.prod(x.shape[axis + 1:], dtype=np.int64))
    if P == 0 or W == 0:
        return x
    xr = x.reshape(P, E, W)
    lb = _blk(budget_lines, 128, -(-W // 128) * 128)
    y = pl.pallas_call(
        partial(_sublane_kernel, scans=tuple(scans), E=E,
                roll_mode=_roll_mode(interpret)),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=(P, -(-W // lb)),
        in_specs=[pl.BlockSpec((None, E, lb), lambda p, l: (p, 0, l),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, E, lb), lambda p, l: (p, 0, l),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(xr)
    return y.reshape(x.shape)
