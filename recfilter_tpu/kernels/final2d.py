"""Pallas kernels for the 2-D overlapped pipeline's big passes.

With all carries pre-solved (``overlap2d``), both remaining passes are
embarrassingly parallel over 2-D tiles — no carried state, no latency
chains, pure per-block MXU matmuls:

  * ``moments2d``  (pass 1): read an (Ta, Tb) tile of x, emit the dim-A
    local tails ``G_A·x`` and dim-B moments ``x·G_Bᵀ`` (carry-sized).
  * ``final2d``    (passes 2+3 fused): read the x tile once, form the
    dim-A completion Z = Btot_A·x + Rhat_A·N_A **in VMEM**, and write
    Y = Z·Btot_Bᵀ + N_B·Rhat_Bᵀ. Z never touches HBM — this is what turns
    the 5-touch XLA pipeline into 3 touches.

Per-tile matrix variants (clamp edges, padding projector) ride stacked
operand arrays indexed by the grid position via BlockSpec index maps; the
uniform case collapses the stack to one slice.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stack3(mat_stack) -> jnp.ndarray:
    """(n|1, o, s) numpy stack → f32 jnp array."""
    return jnp.asarray(np.asarray(mat_stack), dtype=jnp.float32)


def _idx_or0(size):
    """Index map component: follow the grid when stacked, pin 0 otherwise."""
    return (lambda v: v) if size > 1 else (lambda v: 0)


def _final2d_kernel(Ba_ref, Ra_ref, Bb_ref, Rb_ref, x_ref, NA_ref, NB_ref,
                    o_ref):
    x = x_ref[:]
    # dim-A completion, VMEM-resident (pass 2)
    z = jnp.dot(Ba_ref[:], x, preferred_element_type=jnp.float32)
    z = z + jnp.dot(Ra_ref[:], NA_ref[:], preferred_element_type=jnp.float32)
    # dim-B completion (pass 3)
    y = jnp.dot(z, Bb_ref[:].T, preferred_element_type=jnp.float32)
    y = y + jnp.dot(NB_ref[:], Rb_ref[:].T, preferred_element_type=jnp.float32)
    o_ref[:] = y


def final2d(x, Btot_a, Rhat_a_cat, Btot_b, Rhat_b_cat, NA_cat, NB_cat,
            interpret: bool):
    """Fused passes 2+3.

    x        : (outer, na, Ta, nb, Tb)
    Btot_a   : (na|1, Ta, Ta);  Rhat_a_cat: (na|1, Ta, Ka)
    Btot_b   : (nb|1, Tb, Tb);  Rhat_b_cat: (nb|1, Tb, Kb)
    NA_cat   : (outer, na, Ka, nb, Tb)
    NB_cat   : (outer, na, Ta, nb, Kb)
    returns  : (outer, na, Ta, nb, Tb)
    """
    outer, na, Ta, nb, Tb = x.shape
    Ka = NA_cat.shape[2]
    Kb = NB_cat.shape[4]
    Ba, Ra = _stack3(Btot_a), _stack3(Rhat_a_cat)
    Bb, Rb = _stack3(Btot_b), _stack3(Rhat_b_cat)
    ia, ib = _idx_or0(Ba.shape[0]), _idx_or0(Bb.shape[0])
    iar, ibr = _idx_or0(Ra.shape[0]), _idx_or0(Rb.shape[0])

    return pl.pallas_call(
        _final2d_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(outer, na, nb),
        in_specs=[
            pl.BlockSpec((None, Ta, Ta), lambda o, a, b: (ia(a), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Ta, Ka), lambda o, a, b: (iar(a), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tb, Tb), lambda o, a, b: (ib(b), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tb, Kb), lambda o, a, b: (ibr(b), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, Ta, None, Tb),
                         lambda o, a, b: (o, a, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, Ka, None, Tb),
                         lambda o, a, b: (o, a, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, Ta, None, Kb),
                         lambda o, a, b: (o, a, 0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, Ta, None, Tb), lambda o, a, b: (o, a, 0, b, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(Ba, Ra, Bb, Rb, x, NA_cat, NB_cat)


def _moments_kernel(Ga_ref, Gb_ref, x_ref, ba_ref, u_ref):
    x = x_ref[:]
    ba_ref[:] = jnp.dot(Ga_ref[:], x, preferred_element_type=jnp.float32)
    u_ref[:] = jnp.dot(x, Gb_ref[:].T, preferred_element_type=jnp.float32)


def moments2d(x, G_a_cat, G_b_cat, interpret: bool):
    """Pass 1: raw dim-A tails and dim-B moments in one read.

    x       : (outer, na, Ta, nb, Tb)
    G_a_cat : (na|1, Ka, Ta) — all A-scans' G stacked along rows
    G_b_cat : (nb|1, Kb, Tb)
    returns : bA (outer, na, Ka, nb, Tb), U (outer, na, Ta, nb, Kb)
    """
    outer, na, Ta, nb, Tb = x.shape
    Ga, Gb = _stack3(G_a_cat), _stack3(G_b_cat)
    Ka, Kb = Ga.shape[1], Gb.shape[1]
    ia, ib = _idx_or0(Ga.shape[0]), _idx_or0(Gb.shape[0])

    return pl.pallas_call(
        _moments_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((outer, na, Ka, nb, Tb), jnp.float32),
            jax.ShapeDtypeStruct((outer, na, Ta, nb, Kb), jnp.float32),
        ),
        grid=(outer, na, nb),
        in_specs=[
            pl.BlockSpec((None, Ka, Ta), lambda o, a, b: (ia(a), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Kb, Tb), lambda o, a, b: (ib(b), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, Ta, None, Tb),
                         lambda o, a, b: (o, a, 0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, None, Ka, None, Tb),
                         lambda o, a, b: (o, a, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, Ta, None, Kb),
                         lambda o, a, b: (o, a, 0, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Ga, Gb, x)
