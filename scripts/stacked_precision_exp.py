#!/usr/bin/env python
"""Measure the STACKED-contraction compensated-f32 completion matmul.

Hypothesis: the split-bf16 cross terms (f32x6's 6 products) can ride ONE
single-pass bf16 MXU dot by stacking the chunk blocks along the contraction
axis — Bs = [M_i blocks] (o, 6T), Xs = [c_j blocks] (P, n, 6T) — with f32
accumulation. Versus XLA HIGHEST (6 internal passes + operand copies) this
trades 6 dispatched MXU passes for one longer dot whose operands are
produced by an elementwise chunk fusion; the B-side chunks are compile-time
constants. Error is term-identical to the f32x6 mode (~1.5e-6, the f32
floor).

    nohup python scripts/stacked_precision_exp.py > /tmp/stacked_exp.log 2>&1 &
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=4096)
    p.add_argument("--tiles", type=int, default=32)
    p.add_argument("-T", type=int, default=128)
    p.add_argument("--modes", default="default,highest,stacked6,stacked4")
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from recfilter_tpu.dimfuse import _split_const

    P, n, T = ns.rows, ns.tiles, ns.T
    rng = np.random.default_rng(0)
    # Lower-triangular with geometrically decaying rows — the shape of a
    # real completion matrix Btot (IIR impulse response), so bf16 chunk
    # magnitudes behave like production.
    decay = 0.97 ** np.abs(np.subtract.outer(np.arange(T), np.arange(T)))
    B64 = np.tril(decay * (0.5 + 0.5 * rng.random((T, T)))) / 8.0
    B = jnp.asarray(B64, jnp.float32)
    Ms = _split_const(B64, 3)  # bf16 chunks, exact from float64

    X0 = jnp.asarray(rng.standard_normal((P, n, T)), jnp.float32)

    PAIRS = {
        "stacked6": [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (2, 0)],
        "stacked4": [(0, 0), (0, 1), (1, 0), (1, 1)],
        "stacked3": [(0, 0), (0, 1), (1, 0)],
    }

    def make_body(mode):
        if mode in ("default", "highest"):
            prec = (jax.lax.Precision.HIGHEST if mode == "highest"
                    else jax.lax.Precision.DEFAULT)

            def body(v):
                return jnp.einsum("os,pns->pno", B, v,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)

            return body
        pairs = PAIRS[mode]
        Bs = jnp.asarray(
            np.concatenate([np.asarray(Ms[i], np.float32) for i, _ in pairs],
                           axis=1), jnp.bfloat16)
        nchunk = max(j for _, j in pairs) + 1

        def body(v):
            cs, rem = [], v
            for _ in range(nchunk - 1):
                c = rem.astype(jnp.bfloat16)
                cs.append(c)
                rem = rem - c.astype(jnp.float32)
            cs.append(rem.astype(jnp.bfloat16))
            xs = jnp.concatenate([cs[j] for _, j in pairs], axis=-1)
            return jnp.einsum("os,pns->pno", Bs, xs,
                              preferred_element_type=jnp.float32)

        return body

    # accuracy first (single application vs float64)
    ref = np.einsum("os,pns->pno", B64, np.asarray(X0, np.float64))
    scaleref = np.abs(ref).max()
    mb = P * n * T * 4 / 1e6
    for mode in ns.modes.split(","):
        body = make_body(mode)
        out = np.asarray(jax.jit(body)(X0), np.float64)
        relmax = np.abs(out - ref).max() / scaleref
        ms = bench.slope_ms_per_iter(body, X0, scale=4.0, per_body=4)
        gbps = 2 * mb / ms  # nominal f32 in+out
        print(
            f'{{"mode": "{mode}", "max_rel_err": {relmax:.3e}, '
            f'"ms": {ms:.4f}, "nominal_GBps": {gbps:.0f}}}',
            flush=True,
        )


if __name__ == "__main__":
    main()
