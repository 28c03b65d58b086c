"""Fused 2-D stencil kernel: shifted-tap banks in 2 HBM touches.

The XLA pad/slice formulation of a multi-tap 2-D stencil (DoG's 4-corner
SAT differencing, ``apps/DoG/diff_gauss.cpp:29-38``) materializes padded
intermediates — xplane-measured 0.78 ms at 4K for the dual-radius
differencing vs a 0.29 ms read+write floor. Here the whole bank is one
Pallas kernel: each grid step owns a (Rb, W) row block plus two row-halo
strips (shifted block-index maps); lane shifts run INSIDE the full-width
block (no lane halo exists), row shifts ride the halo strips, and every
output channel's taps accumulate in VMEM.

Border semantics per direction (matching ``apps/dog._shift_clamped``):
positive offsets clamp to the far edge (real integral totals live there),
negative offsets read constant 0 (the apps' zeroed input margins make the
integral image 0 there). Row-halo strips provide zeros at the global
top/bottom automatically; clamping replicates the block's own global
edge row/lane in-kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R8 = 8


def _lane_shift(v, dx: int, W: int, clamp_pos: bool, interpret: bool):
    """Shift (rows, W) by dx along lanes with global-edge semantics.

    Mosaic cannot concatenate lane-misaligned slices ("offset mismatch on
    non-concat dimension"), so the shift is a circular ``pltpu.roll`` with
    the wrapped columns masked to the edge value (clamp) or zero."""
    if dx == 0:
        return v
    if interpret:
        rolled = jnp.roll(v, -dx, axis=1)
    else:
        rolled = pltpu.roll(v, (-dx) % W, 1)  # roll shift must be >= 0
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    if dx > 0:
        fill = (jnp.broadcast_to(v[:, W - 1:W], v.shape) if clamp_pos
                else jnp.zeros_like(v))
        return jnp.where(cols >= W - dx, fill, rolled)
    return jnp.where(cols < -dx, jnp.zeros_like(v), rolled)


def _stencil2d_kernel(x_ref, prev_ref, nxt_ref, *o_refs, taps_c, Rb, W,
                      hp8, hn8, nblk, single, interpret):
    g = pl.program_id(0)
    pm = jnp.where(g > 0, 1.0, 0.0).astype(x_ref.dtype)
    nm = jnp.where(g < nblk - 1, 1.0, 0.0).astype(x_ref.dtype)
    parts = []
    if hp8:
        parts.append(prev_ref[:] * pm)
    parts.append(x_ref[:])
    if hn8:
        parts.append(nxt_ref[:] * nm)
    xext = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Rb, W), 0)
    lastrow = jnp.broadcast_to(x_ref[Rb - 1:Rb], (Rb, W))
    for c, taps in enumerate(taps_c):
        acc = None
        for dy, dx, coeff in taps:
            t = jax.lax.slice(xext, (hp8 + dy, 0), (hp8 + dy + Rb, W))
            if dy > 0:
                # clamp: global-bottom rows replicate the last row (which
                # lives in THIS block only when g == nblk-1)
                t = jnp.where((g == nblk - 1) & (rows >= Rb - dy),
                              lastrow, t)
            t = _lane_shift(t, dx, W, clamp_pos=True,
                            interpret=interpret) * coeff
            acc = t if acc is None else acc + t
        o_refs[c][:] = acc.astype(o_refs[c].dtype)


def stencil2d_ref(y, taps_c):
    """XLA pad/slice twin of :func:`stencil2d_pass` on the TRAILING two
    axes of an arbitrary-rank array (same border semantics: positive
    offsets clamp, negative read zero). Always returns a tuple of
    per-channel arrays — the fallback form for fused 2-D stencil
    consumers when the kernel paths' gates fail."""
    nd = y.ndim
    outs = []
    for taps in taps_c:
        acc = None
        for dy, dx, coeff in taps:
            t = y
            for off, ax in ((int(dy), nd - 2), (int(dx), nd - 1)):
                if off == 0:
                    continue
                n = t.shape[ax]
                lo, hi = max(off, 0), max(-off, 0)
                pads = [(0, 0)] * nd
                pads[ax] = (hi, lo)
                t = jnp.pad(t, pads, mode="edge" if off > 0 else "constant")
                t = jax.lax.slice_in_dim(t, lo, lo + n, axis=ax)
            t = t * float(coeff)
            acc = t if acc is None else acc + t
        outs.append(acc)
    return tuple(outs)


def stencil2d_pass(x, taps_c, *, interpret: bool = False):
    """Apply C channel banks of 2-D shifted taps to a (H, W) image.

    ``taps_c``: per output channel, ``[(dy, dx, coeff), ...]``. Positive
    offsets clamp at the far edges, negative offsets read zero (the DoG
    SAT-differencing contract). Returns (C, H, W) — or (H, W) when C == 1.
    """
    H, W = x.shape
    taps_c = [[(int(dy), int(dx), float(c)) for dy, dx, c in taps]
              for taps in taps_c]
    C = len(taps_c)
    hp = max(max((-dy for t in taps_c for dy, _, _ in t), default=0), 0)
    hn = max(max((dy for t in taps_c for dy, _, _ in t), default=0), 0)
    hp8 = -(-hp // _R8) * _R8
    hn8 = -(-hn // _R8) * _R8
    # Row block: a divisor of H (padding would cost full-array copies),
    # halo strips must tile it (hp8/hn8 | Rb). Cap 64: the block carries
    # full-width rows ×(C out + ext + per-tap temps) — 256 rows blew the
    # 16M scoped-VMEM limit at 4K (30.5M measured).
    quant = max(_R8, hp8, hn8, 1)
    Rb = 0
    for d in range(min(64, H), quant - 1, -quant):
        if H % d == 0 and d % quant == 0:
            Rb = d
            break
    if not Rb:
        return None  # caller falls back to the XLA shift form
    nblk = H // Rb
    kern = partial(_stencil2d_kernel, taps_c=taps_c, Rb=Rb, W=W,
                   hp8=hp8, hn8=hn8, nblk=nblk, single=C == 1,
                   interpret=interpret)
    sp = hp8 or _R8  # strip row size (nonzero for blockspec legality)
    sn = hn8 or _R8
    kp = Rb // sp
    kn = Rb // sn

    def _run(x):
        # one SEPARATE output buffer per channel: consumers slice per
        # channel, and slicing a stacked (C, H, W) pallas output costs a
        # full copy (xplane: 0.29 ms at 4K for DoG's dual radius)
        out_shape = tuple(jax.ShapeDtypeStruct((H, W), x.dtype)
                          for _ in range(C))
        out_spec = tuple(pl.BlockSpec((Rb, W), lambda g: (g, 0),
                                      memory_space=pltpu.VMEM)
                         for _ in range(C))
        y = pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((Rb, W), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sp, W),
                             lambda g: (jnp.maximum(g * kp - 1, 0), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sn, W),
                             lambda g: (jnp.minimum((g + 1) * kn,
                                                    nblk * kn - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=interpret,
        )(x, x, x)
        return y[0] if C == 1 else y

    # VJP via the XLA shift twin (linear in x).
    def _ref(x):
        outs = []
        for taps in taps_c:
            acc = None
            for dy, dx, coeff in taps:
                t = x
                for off, ax in ((dy, 0), (dx, 1)):
                    if off == 0:
                        continue
                    n = t.shape[ax]
                    lo, hi = max(off, 0), max(-off, 0)
                    pads = [(0, 0)] * 2
                    pads[ax] = (hi, lo)
                    t = jnp.pad(t, pads,
                                mode="edge" if off > 0 else "constant")
                    t = jax.lax.slice_in_dim(t, lo, lo + n, axis=ax)
                t = t * coeff
                acc = t if acc is None else acc + t
            outs.append(acc)
        return outs[0] if C == 1 else tuple(outs)

    f = jax.custom_vjp(_run)
    f.defvjp(lambda x: (_run(x), x),
             lambda x0, ct: jax.vjp(_ref, x0)[1](ct))
    return f(x)
