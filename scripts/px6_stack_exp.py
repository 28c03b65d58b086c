#!/usr/bin/env python
"""px6 kernel variants: 6 separate MXU dots vs ONE stacked-contraction dot.

The px6 completion kernel is compute-bound (6 products ≈ 26 GF/pass). A
single dot with contraction 6T — B chunks [B0,B0,B0,B1,B1,B2] against
x chunks [x0,x1,x2,x0,x1,x0] concatenated in VMEM — does the same math in
one MXU op (better pipelining, one accumulator pass).

    nohup python scripts/px6_stack_exp.py > /tmp/px6_stack.log 2>&1 &
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import slope_ms_per_iter
from recfilter_tpu.kernels.completion import _split_const, _split_vmem, _prods

T, W = 128, 4096
PAIRS6 = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (2, 0)]


def _kern_sep(B0, B1, B2, x_ref, o_ref, *, nprod):
    xs = _split_vmem(x_ref[:], 3)
    Bs = [B0, B1, B2]
    dn = (((1,), (1,)), ((), ()))
    acc = None
    for i, j in _prods(nprod):
        t = jax.lax.dot_general(Bs[i][:], xs[j], dn,
                                preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    o_ref[:] = acc


def _kern_stack(Bcat_ref, x_ref, o_ref, *, pairs):
    xs = _split_vmem(x_ref[:], 3)
    xcat = jnp.concatenate([xs[j] for _, j in pairs], axis=1)  # (Lb, 6T)
    dn = (((1,), (1,)), ((), ()))
    o_ref[:] = jax.lax.dot_general(Bcat_ref[:], xcat, dn,
                                   preferred_element_type=jnp.float32)


def build(B, variant, Lb):
    Bs = _split_const(B, 3)
    n = W // T
    if variant == "stack":
        Bcat = jnp.concatenate([Bs[i] for i, _ in PAIRS6], axis=1)  # (T, 6T)
        kern = partial(_kern_stack, pairs=PAIRS6)
        mats = [Bcat]
        mat_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:
        kern = partial(_kern_sep, nprod=6)
        mats = list(Bs)
        mat_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    def fn(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n * T, W), jnp.float32),
            grid=(n, W // Lb),
            in_specs=mat_specs + [
                pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, Lb), lambda t, l: (t, l),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            interpret=jax.default_backend() == "cpu",
        )(*mats, x)

    return fn


def main():
    rng = np.random.default_rng(0)
    B0 = (rng.standard_normal((T, T)) / np.sqrt(T)).astype(np.float32)
    x4 = (rng.standard_normal((W, W)) * 0.01).astype(np.float32)
    n = W // T
    x64 = np.asarray(x4, np.float64)
    B64 = np.asarray(B0, np.float64)
    want = np.zeros((W, W))
    for t in range(n):
        want[t * T:(t + 1) * T] = B64 @ x64[:, t * T:(t + 1) * T].T
    scale = np.abs(want).max()
    interpret = jax.default_backend() == "cpu"
    gb = W * W * 4 * 2 / 1e9
    for variant in ("sep", "stack"):
        for Lb in (512, 1024, 2048):
            fn = build(B0, variant, Lb)
            y = np.asarray(jax.jit(fn)(jnp.asarray(x4)))
            err = float(np.abs(y - want).max() / scale)
            row = {"variant": variant, "Lb": Lb,
                   "max_rel_err": f"{err:.3e}"}
            if not interpret:
                ms = slope_ms_per_iter(fn, jnp.asarray(x4), scale=0.5)
                row.update({"ms": round(ms, 4),
                            "GBps": round(gb / ms * 1000.0, 1)})
            print(json.dumps(row), flush=True)
            if interpret:
                break


if __name__ == "__main__":
    main()
