"""Split-bf16 completion-pass kernel: accurate f32 at near-default-dot cost.

The VMEM-resident twin of dimfuse's completion step

    Y = Btot·X  +  Rcat·Ncat        (per tile, optionally emitted rotated)

for the compensated precision modes. XLA's ``Precision.HIGHEST`` einsums in
the transpose-emitting composite forms materialize operand-conversion
copies (~0.3 ms/iter at 4K — xplane evidence in the round-1 notes), and the
hand-split ``f32x3`` einsum mode materializes the bf16 operand chunks in
HBM. Here both problems disappear: each x block is split into bf16 chunks
IN VMEM, the compensated cross products run as independent MXU dots with
f32 accumulation, the carry injection (small contraction, error-dominant —
kept at true-f32 HIGHEST) is added in-register, and the block is emitted
directly in the rotated layout. HBM traffic: read X + read the (tiny)
carries + write Y — the same two image touches as the throughput mode.

Accuracy (max rel err vs the f64 oracle, microbenchmarked):
  * 3 products (``px3``):  ~6e-6  — dropped terms at 2^-16
  * 4 products (``px4``):  ~2e-6  — representation-limited (2-chunk = 2^-17)
Both sit within the float32-SNR bar the oracle suite enforces (the
reference's CheckResult, ``lib/recfilter.h:793-855``).

Mosaic layout notes: T must be the 128-lane tile; the carries ride a
transposed (n·8, q) array — 8 sublane slots per tile (order padded up) —
because an (Lb, S<128) lane block is not expressible; the per-tile carry
dot contracts over those 8 sublanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST
_VMEM_BUDGET = 6 * 1024 * 1024
_SLOTS = 8  # carry slots per tile (sublane quantum); max ΣK supported


def _split_const_pair(M):
    """Trace-time 2-chunk bf16 split of a matrix stack (float64-exact)."""
    import ml_dtypes

    M64 = np.asarray(M, np.float64)
    hi = M64.astype(np.float32).astype(ml_dtypes.bfloat16)
    lo = (M64 - hi.astype(np.float64)).astype(np.float32).astype(
        ml_dtypes.bfloat16
    )
    return jnp.asarray(hi), jnp.asarray(lo)


def _completion_kernel(Bh_ref, Bm_ref, Rh_ref, Rm_ref, N_ref, x_ref, o_ref,
                       *, nprod: int, rot: bool):
    """One (Lb, T) x-block + (8, Lb) carry block -> (T, Lb) (rot) or
    (Lb, T) out-block. The carry injection uses the same split-bf16
    compensation as the B products (a HIGHEST skinny dot measured ~0.08 ms
    per pass in Mosaic's multi-pass lowering — the splits are cheaper)."""
    x = x_ref[:]
    xh = x.astype(jnp.bfloat16)
    xm = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    Bh = Bh_ref[0]
    Bm = Bm_ref[0]
    Nt = N_ref[0]  # (8, Lb) f32
    nh = Nt.astype(jnp.bfloat16)
    nm = (Nt - nh.astype(jnp.float32)).astype(jnp.bfloat16)
    if rot:
        # (T,T)x(Lb,T) -> (T,Lb): contract both operands' axis 1.
        dn = (((1,), (1,)), ((), ()))
        acc = jax.lax.dot_general(Bh, xh, dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(Bh, xm, dn,
                                        preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(Bm, xh, dn,
                                        preferred_element_type=jnp.float32)
        if nprod >= 4:
            acc = acc + jax.lax.dot_general(
                Bm, xm, dn, preferred_element_type=jnp.float32)
        # carry injection: (T,8)x(8,Lb) -> (T,Lb), compensated
        dc = (((1,), (0,)), ((), ()))
        acc = acc + jax.lax.dot_general(
            Rh_ref[0], nh, dc, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            Rh_ref[0], nm, dc, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            Rm_ref[0], nh, dc, preferred_element_type=jnp.float32)
    else:
        acc = jnp.dot(xh, Bh.T, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xm, Bh.T, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xh, Bm.T, preferred_element_type=jnp.float32)
        if nprod >= 4:
            acc = acc + jnp.dot(xm, Bm.T,
                                preferred_element_type=jnp.float32)
        # (Lb,8)x(8,T) via contracting Nt's sublanes against R's slots
        dc = (((0,), (1,)), ((), ()))
        acc = acc + jax.lax.dot_general(
            nh, Rh_ref[0], dc, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            nm, Rh_ref[0], dc, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            nh, Rm_ref[0], dc, preferred_element_type=jnp.float32)
    o_ref[:] = acc


def completion_pass(x, Btot, Rcat, Ncat, *, rot: bool, nprod: int = 4,
                    interpret: bool = False):
    """Split-bf16 completion over a (q, n, T) array.

    ``x``: (q, n, T) f32 (rows, tiles, tile width); ``Btot``: (nv, T, T)
    with nv in {1, n} (per-tile variant stack for clamp/pad); ``Rcat``:
    (nv, T, S); ``Ncat``: (q, n, S) f32 incoming carries (S = ΣK ≤ 8).
    Returns (n, T, q) when ``rot`` else (q, n, T).
    """
    q, n, T = x.shape
    S = Ncat.shape[-1]
    assert S <= _SLOTS, "carry slots exceed the kernel's sublane quantum"
    nv = np.asarray(Btot).shape[0]
    assert nv in (1, n), "Btot stack must be uniform or per-tile"
    Bh, Bm = _split_const_pair(Btot)
    Rp = np.zeros((max(nv, n), T, _SLOTS), np.float64)
    Rp[:, :, :S] = np.asarray(Rcat, np.float64)[
        np.minimum(np.arange(n), nv - 1)
    ]
    Rh, Rm = _split_const_pair(Rp)

    per_line = T * 4 * 2
    Lb = max(8, min(((_VMEM_BUDGET // per_line) // 128) * 128, 2048))
    qp = -(-q // Lb) * Lb if q > Lb else Lb
    if q < Lb:
        Lb = max(8, min(((q + 7) // 8) * 8, Lb))
        qp = -(-q // Lb) * Lb
    if qp != q:
        x = jnp.pad(x, ((0, qp - q), (0, 0), (0, 0)))
        Ncat = jnp.pad(Ncat, ((0, qp - q), (0, 0), (0, 0)))

    xf = x.reshape(qp, n * T)
    # Carries transposed to (n, 8, qp): slot-padded sublane layout.
    Nt = jnp.transpose(Ncat.astype(jnp.float32), (1, 2, 0))  # (n, S, qp)
    if S < _SLOTS:
        Nt = jnp.pad(Nt, ((0, 0), (0, _SLOTS - S), (0, 0)))
    bidx = (lambda t, l: (t, 0, 0)) if nv > 1 else (lambda t, l: (0, 0, 0))
    kern = partial(_completion_kernel, nprod=nprod, rot=rot)
    out_shape = (
        jax.ShapeDtypeStruct((n * T, qp), jnp.float32)
        if rot
        else jax.ShapeDtypeStruct((qp, n * T), jnp.float32)
    )
    out_spec = (
        pl.BlockSpec((T, Lb), lambda t, l: (t, l), memory_space=pltpu.VMEM)
        if rot
        else pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                          memory_space=pltpu.VMEM)
    )
    y = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(n, qp // Lb),
        in_specs=[
            pl.BlockSpec((1, T, T), bidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, T), bidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, _SLOTS), lambda t, l: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, _SLOTS), lambda t, l: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SLOTS, Lb), lambda t, l: (t, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        interpret=interpret,
    )(Bh, Bm, Rh, Rm, Nt, xf)
    if rot:
        y = y.reshape(n, T, qp)
        return y[..., :q] if qp != q else y
    y = y.reshape(qp, n, T)
    return y[:q] if qp != q else y


def completion_ok(T: int, q: int, n: int, S: int, interpret: bool) -> bool:
    """Static applicability gate: the Mosaic path needs the 128-lane tile,
    carries fitting the sublane quantum, and a bounded tile count (the
    audio-scale n ~ 10^4 chain keeps the einsum path). Interpret mode
    accepts the same shapes so CPU tests cover the kernel structure."""
    return T == 128 and S <= _SLOTS and n <= 512 and q >= 8
