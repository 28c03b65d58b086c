"""Go/no-go probe for the int8/Ozaki headline route (VERDICT r3 #1).

Measures the chip's raw MXU rate for int8 x int8 -> int32 dots vs
bf16 x bf16 dots, via XLA einsum and via a minimal Pallas kernel.

Why this decides the route: true-f32 via split-bf16 costs 6 MXU products
(px6); true-f32 via int8 slicing (7-bit mantissa slices, constant operand
pre-sliced free) needs the 10 products with slice-significance i+j<=3.
The int8 route only wins if rate(int8) / rate(bf16) > 10/6 ~ 1.67x.

Run:  python scripts/int8_rate_probe.py   (TPU, one process, ~3 compiles)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import slope_ms_per_iter  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 4096
    rng = np.random.default_rng(0)
    Bf = jnp.asarray(rng.standard_normal((n, n)) * 0.01, jnp.bfloat16)
    Bi = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)

    flops = 2.0 * n * n * n

    # --- XLA einsum, bf16 (single-pass: the px kernels' product currency)
    def f_bf16(v):
        return jax.lax.dot(v, Bf, preferred_element_type=jnp.bfloat16)

    # --- XLA einsum, int8 -> int32, renormalized back to int8
    def f_int8(v):
        y = jax.lax.dot(v, Bi, preferred_element_type=jnp.int32)
        return jax.lax.shift_right_arithmetic(y, 13).astype(jnp.int8)

    # --- Pallas int8 dot (the kernels are pallas; Mosaic must hit the
    # native int8 MXU path for the route to matter). 512x512 output tiles,
    # full-K contraction per tile (x strip 2 MB + B strip 2 MB in VMEM).
    def k_int8(x_ref, b_ref, o_ref):
        y = jnp.dot(x_ref[:], b_ref[:], preferred_element_type=jnp.int32)
        o_ref[:] = jax.lax.shift_right_arithmetic(y, 13).astype(jnp.int8)

    def f_int8_pl(v):
        return pl.pallas_call(
            k_int8,
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.int8),
            grid=(n // 512, n // 512),
            in_specs=[
                pl.BlockSpec((512, n), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 512), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((512, 512), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
        )(v, Bi)

    # --- Pallas bf16 dot, same structure (so kernel overheads cancel)
    def k_bf16(x_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    def f_bf16_pl(v):
        return pl.pallas_call(
            k_bf16,
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.bfloat16),
            grid=(n // 512, n // 512),
            in_specs=[
                pl.BlockSpec((512, n), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 512), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((512, 512), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
        )(v, Bf)

    xb = jnp.asarray(rng.standard_normal((n, n)) * 0.01, jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)

    results = {}
    for name, fn, img in [
        ("einsum_bf16", f_bf16, xb),
        ("einsum_int8", f_int8, xi),
        ("pallas_bf16", f_bf16_pl, xb),
        ("pallas_int8", f_int8_pl, xi),
    ]:
        t0 = time.time()
        ms = slope_ms_per_iter(fn, img)
        tops = flops / (ms * 1e-3) / 1e12
        results[name] = (ms, tops)
        print(f"{name}: {ms:.3f} ms  {tops:.1f} TOP/s  "
              f"(compile+measure {time.time()-t0:.0f}s)", flush=True)

    r_eins = results["einsum_bf16"][0] / results["einsum_int8"][0]
    r_pl = results["pallas_bf16"][0] / results["pallas_int8"][0]
    print(f"\nint8 speedup: einsum {r_eins:.2f}x, pallas {r_pl:.2f}x")
    print(f"break-even for the 10-vs-6-product Ozaki scheme: 1.67x")
    print("VERDICT:", "GO" if max(r_eins, r_pl) > 1.67 else "NO-GO")


if __name__ == "__main__":
    main()
