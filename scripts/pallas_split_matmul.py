#!/usr/bin/env python
"""Pallas split-bf16 matmul experiment: accurate f32 dots at default-dot cost.

The question (VERDICT r1 #1): XLA's HIGHEST (6-pass bf16) costs ~3x the
default single-pass bf16 dot AND materializes operand-conversion copies
(~0.3 ms/iter in the gaussian3 trace). A Pallas kernel that splits the
image operand into bf16 chunks IN VMEM (no HBM round-trip) and runs the
cross products as independent MXU dots with f32 accumulation should hit
the bandwidth floor of the default dot at ~1e-5 (x3) or f32-grade (x6)
accuracy.

    nohup python scripts/pallas_split_matmul.py > /tmp/split_mm.log 2>&1 &

Modes: default | highest | px3 (2-chunk, 3 products) | px6 (3-chunk, 6).
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

N, T = 131072, 128  # ≙ a 4K image's completion matmul, tiles on lanes
Lb = 2048


def _kernel(Bh_ref, Bm_ref, Bl_ref, x_ref, o_ref, *, nprod):
    x = x_ref[:]
    xh = x.astype(jnp.bfloat16)
    r = x - xh.astype(jnp.float32)
    xm = r.astype(jnp.bfloat16)
    Bh = Bh_ref[:]
    acc = jnp.dot(xh, Bh, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xm, Bh, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xh, Bm_ref[:], preferred_element_type=jnp.float32)
    if nprod >= 6:
        xl = (r - xm.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jnp.dot(xm, Bm_ref[:], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xl, Bh, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xh, Bl_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = acc


def _split_host(B):
    """B → (Bh, Bm, Bl) bf16 chunks, exact to ~2^-25."""
    Bf = np.asarray(B, np.float64)
    Bh = np.asarray(Bf.astype(np.float32), np.dtype("bfloat16"))
    r = Bf - np.asarray(Bh, np.float64)
    Bm = np.asarray(r.astype(np.float32), np.dtype("bfloat16"))
    Bl = np.asarray(
        (r - np.asarray(Bm, np.float64)).astype(np.float32),
        np.dtype("bfloat16"),
    )
    return jnp.asarray(Bh), jnp.asarray(Bm), jnp.asarray(Bl)


def pallas_split_mm(B, nprod, interpret=False):
    Bh, Bm, Bl = _split_host(B)
    kern = partial(_kernel, nprod=nprod)

    def fn(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, T), jnp.float32),
            grid=(N // Lb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((Lb, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Lb, T), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(Bh, Bm, Bl, x)

    return fn


def _kernel_t(Bh_ref, Bm_ref, R_ref, N_ref, x_ref, o_ref, *, nprod):
    """Completion-pass shape: per-tile split dots + carry-injection epilogue,
    TRANSPOSED emit (the dimfuse rotated-emit contract) — all in VMEM."""
    x = x_ref[:]
    xh = x.astype(jnp.bfloat16)
    r = x - xh.astype(jnp.float32)
    xm = r.astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(Bh_ref[:], xh, dn,
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(Bh_ref[:], xm, dn,
                                    preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(Bm_ref[:], xh, dn,
                                    preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(R_ref[:], N_ref[:], dn,
                                    preferred_element_type=jnp.float32)
    o_ref[:] = acc


def pallas_split_mm_t(B, W, S, Lb_t, interpret=False):
    """y[t*T:(t+1)*T, l] = B @ x[l, t*T:(t+1)*T] + R @ N[l] — the full
    completion pass with transposed emit. W = n*T total width."""
    n = W // T
    Bh, Bm, _ = _split_host(B)
    rng = np.random.default_rng(1)
    R = jnp.asarray((rng.standard_normal((T, S)) * 0.1).astype(np.float32))
    Nc = jnp.asarray(
        (rng.standard_normal((W, S)) * 0.01).astype(np.float32)
    )
    kern = partial(_kernel_t, nprod=3)

    def fn(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((W, W), jnp.float32),
            grid=(n, W // Lb_t),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((Lb_t, S), lambda t, l: (l, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lb_t, T), lambda t, l: (l, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, Lb_t), lambda t, l: (t, l),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(Bh, Bm, R, Nc, x)

    return fn, R, Nc


def main():
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    x0 = (rng.standard_normal((N, T)) * 0.01).astype(np.float32)
    B0 = (rng.standard_normal((T, T)) / np.sqrt(T)).astype(np.float32)
    want = np.asarray(x0, np.float64) @ np.asarray(B0, np.float64)
    scale = np.abs(want).max()

    Bj = jnp.asarray(B0)
    xj = jnp.asarray(x0)

    modes = {
        "default": lambda v: jnp.dot(v, Bj),
        "highest": lambda v: jnp.dot(v, Bj, precision=jax.lax.Precision.HIGHEST),
        "px3": pallas_split_mm(B0, 3, interpret),
        "px6": pallas_split_mm(B0, 6, interpret),
    }
    # Full completion-pass variant: 4096x4096 image, transposed emit,
    # carry epilogue fused. Error checked against numpy f64.
    W4, S = 4096, 6
    fn_t, R_t, N_t = pallas_split_mm_t(B0, W4, S, 512, interpret)
    x4 = (rng.standard_normal((W4, W4)) * 0.01).astype(np.float32)
    y_t = np.asarray(jax.jit(fn_t)(jnp.asarray(x4)))
    n4 = W4 // T
    want_t = np.zeros((W4, W4))
    x64 = np.asarray(x4, np.float64)
    B64 = np.asarray(B0, np.float64)
    RN64 = np.asarray(R_t, np.float64) @ np.asarray(N_t, np.float64).T
    for t in range(n4):
        want_t[t * T : (t + 1) * T] = B64 @ x64[:, t * T : (t + 1) * T].T + RN64
    err_t = float(np.abs(y_t - want_t).max() / np.abs(want_t).max())
    row = {"mode": "px3t_completion", "max_rel_err": f"{err_t:.3e}"}
    if not interpret:
        ms = slope_ms_per_iter(fn_t, jnp.asarray(x4), scale=0.5)
        gb_t = W4 * W4 * 4 * 2 / 1e9
        row.update({"ms": round(ms, 4), "GBps": round(gb_t / ms * 1000.0, 1)})
    print(json.dumps(row), flush=True)

    gb = N * T * 4 * 2 / 1e9  # r+w f32
    for name, fn in modes.items():
        y = np.asarray(jax.jit(fn)(xj))
        err = float(np.abs(y - want).max() / scale)
        if interpret:
            print(json.dumps({"mode": name, "max_rel_err": f"{err:.3e}"}),
                  flush=True)
            continue
        ms = slope_ms_per_iter(fn, xj, scale=0.5)
        print(
            json.dumps(
                {
                    "mode": name,
                    "max_rel_err": f"{err:.3e}",
                    "ms": round(ms, 4),
                    "GBps": round(gb / ms * 1000.0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
