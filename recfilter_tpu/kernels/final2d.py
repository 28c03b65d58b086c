"""Pallas kernels for the 2-D overlapped pipeline's big passes.

With all carries pre-solved (``overlap2d``), both remaining passes are
embarrassingly parallel — no carried state, no latency chains, pure
per-block MXU matmuls:

  * ``moments2d``  (pass 1): read tiles of x once, emit the dim-A local
    tails ``G_A·x`` and dim-B moments ``x·G_Bᵀ`` (carry-sized outputs).
  * ``final2d``    (passes 2+3 fused): read the x tile once, form the
    dim-A completion Z = Btot_A·x + Rhat_A·N_A **in VMEM**, and write
    Y = Z·Btot_Bᵀ + N_B·Rhat_Bᵀ. Z never touches HBM — this is what turns
    the 5-touch XLA pipeline into 3 touches.

Blocking: one grid step per (outer, a-tile) pair; the block holds the
a-tile's full row of b-tiles (Ta × nb·Tb), and the kernel loops over
b-tiles with static, 128-aligned lane slices (Tb must be 128). This keeps
grid steps big enough to amortize pipeline overhead while every sub-tile
matmul stays independent.

Per-tile matrix variants (clamp edges, padding projector) ride stacked
operand arrays: dim-A stacks are indexed by the grid position via BlockSpec
index maps; dim-B stacks are small and live fully in VMEM, indexed by the
static in-kernel loop counter.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128  # Tb constraint: static lane slices must be 128-aligned


def _stack3(mat_stack) -> jnp.ndarray:
    return jnp.asarray(np.asarray(mat_stack), dtype=jnp.float32)


def _a_index(size):
    return (lambda a: a) if size > 1 else (lambda a: 0)


def _final2d_kernel(Ba_ref, Ra_ref, Bb_ref, Rb_ref, x_ref, NA_ref, NB_ref,
                    o_ref, *, nb, Tb, b_stacked, mm_dtype):
    # dim-A completion for the WHOLE b-row at once, VMEM-resident (pass 2):
    # one (Ta,Ta)@(Ta,W) matmul keeps the MXU pipeline full.
    x = x_ref[:].astype(mm_dtype)
    z = jnp.dot(Ba_ref[:].astype(mm_dtype), x,
                preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    z = z + jnp.dot(Ra_ref[:], NA_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    zc = z.astype(mm_dtype)
    # dim-B completion per sub-tile (pass 3)
    for tb in range(nb):
        sl = slice(tb * Tb, (tb + 1) * Tb)
        bi = tb if b_stacked else 0
        y = jnp.dot(zc[:, sl], Bb_ref[bi].astype(mm_dtype).T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        y = y + jnp.dot(NB_ref[tb], Rb_ref[bi].T,
                        preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        o_ref[:, sl] = y


def final2d(x, Btot_a, Rhat_a_cat, Btot_b, Rhat_b_cat, NA_cat, NB_cat,
            interpret: bool, matmul_dtype=jnp.float32):
    """Fused passes 2+3.

    x        : (outer, na, Ta, nb*Tb)
    Btot_a   : (na|1, Ta, Ta);  Rhat_a_cat: (na|1, Ta, Ka)
    Btot_b   : (nb|1, Tb, Tb);  Rhat_b_cat: (nb|1, Tb, Kb)
    NA_cat   : (outer, na, Ka, nb*Tb)   (row layout, like x)
    NB_cat   : (outer, na, nb, Ta, Kb)
    returns  : (outer, na, Ta, nb*Tb)

    ``matmul_dtype=jnp.bfloat16`` runs the large B matmuls in bf16 with f32
    accumulation (carry injections stay f32) — ~1e-3 relative input
    rounding for 2-4x MXU throughput.
    """
    outer, na, Ta, W = x.shape
    nb = NB_cat.shape[2]
    Tb = W // nb
    Ka, Kb = NA_cat.shape[2], NB_cat.shape[4]
    Ba, Ra = _stack3(Btot_a), _stack3(Rhat_a_cat)
    Bb, Rb = _stack3(Btot_b), _stack3(Rhat_b_cat)
    ia, iar = _a_index(Ba.shape[0]), _a_index(Ra.shape[0])
    b_stacked = Bb.shape[0] > 1

    kernel = partial(_final2d_kernel, nb=nb, Tb=Tb, b_stacked=b_stacked,
                     mm_dtype=matmul_dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(outer, na),
        in_specs=[
            pl.BlockSpec((None, Ta, Ta), lambda o, a: (ia(a), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Ta, Ka), lambda o, a: (iar(a), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Bb stack, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Rb stack, whole
            pl.BlockSpec((None, None, Ta, W), lambda o, a: (o, a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, Ka, W), lambda o, a: (o, a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, nb, Ta, Kb),
                         lambda o, a: (o, a, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, Ta, W), lambda o, a: (o, a, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(Ba, Ra, Bb, Rb, x, NA_cat, NB_cat)


def _moments_kernel(Ga_ref, Gb_ref, x_ref, ba_ref, u_ref, *, nb, Tb,
                    b_stacked):
    Ga = Ga_ref[:]
    for tb in range(nb):
        sl = slice(tb * Tb, (tb + 1) * Tb)
        xt = x_ref[:, sl]
        ba_ref[:, sl] = jnp.dot(Ga, xt, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        gi = tb if b_stacked else 0
        u_ref[tb] = jnp.dot(xt, Gb_ref[gi].T,
                            preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)


def moments2d(x, G_a_cat, G_b_cat, interpret: bool):
    """Pass 1: raw dim-A tails and dim-B moments in one read.

    x       : (outer, na, Ta, nb*Tb)
    G_a_cat : (na|1, Ka, Ta);  G_b_cat : (nb|1, Kb, Tb)
    returns : bA (outer, na, Ka, nb*Tb), U (outer, na, nb, Ta, Kb)
    """
    outer, na, Ta, W = x.shape
    Ga, Gb = _stack3(G_a_cat), _stack3(G_b_cat)
    Ka, Kb = Ga.shape[1], Gb.shape[1]
    Tb = Gb.shape[2]
    nb = W // Tb
    ia = _a_index(Ga.shape[0])
    b_stacked = Gb.shape[0] > 1

    kernel = partial(_moments_kernel, nb=nb, Tb=Tb, b_stacked=b_stacked)

    def _run(x):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((outer, na, Ka, W), jnp.float32),
                jax.ShapeDtypeStruct((outer, na, nb, Ta, Kb), jnp.float32),
            ),
            grid=(outer, na),
            in_specs=[
                pl.BlockSpec((None, Ka, Ta), lambda o, a: (ia(a), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Gb stack, whole
                pl.BlockSpec((None, None, Ta, W), lambda o, a: (o, a, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((None, None, Ka, W), lambda o, a: (o, a, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, nb, Ta, Kb),
                             lambda o, a: (o, a, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(Ga, Gb, x)

    # VJP via the einsum twins (pallas_call has no autodiff rule); both
    # outputs are linear in x.
    Gan = Ga[np.minimum(np.arange(na), Ga.shape[0] - 1)]
    Gbn = Gb[np.minimum(np.arange(nb), Gb.shape[0] - 1)]

    def _ref(x):
        bA = jnp.einsum("akt,oatw->oakw", Gan, x,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        xr = x.reshape(outer, na, Ta, nb, Tb)
        U = jnp.einsum("bks,oatbs->oabtk", Gbn, xr,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return bA, U

    f = jax.custom_vjp(_run)
    f.defvjp(lambda x: (_run(x), x),
             lambda x0, ct: jax.vjp(_ref, x0)[1](ct))
    return f(x)
