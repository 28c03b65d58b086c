"""On-chip timing of the exact tiled integer executor (VERDICT r3 #3).

int32/int16 4K SAT through dimfuse.apply_filter_int_exact (mantissa limbs
x the drop-free f32x9 tiled pass, wrapping recombination) vs the f32 px6
headline pass — the target is bit-exactness at <= 4x the px6 time
(the lax.scan fallback it replaces is device-sequential: orders of
magnitude off).

    python scripts/int_sat_bench.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import slope_ms_per_iter  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from recfilter_tpu import dimfuse
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    w = 4096
    rng = np.random.default_rng(0)

    for dtype, hi in (("int32", 2 ** 24), ("int16", 2 ** 12)):
        spec = FilterSpec(
            "SATi", (Dim("y", w), Dim("x", w)),
            (Scan(1, True, 1, (1,)), Scan(0, True, 1, (1,))),
            dtype=dtype, tile_widths=(128, 128),
        )
        img = jnp.asarray(rng.integers(-hi, hi, (w, w)), jnp.dtype(dtype))

        def fn(v, spec=spec):
            return dimfuse.apply_filter_fused(spec, v)

        # integer SAT grows until wrap; wrapping is the semantics — chained
        # iterations stay exact-cost (no scale needed, ints cannot inf)
        t0 = time.time()
        ms = slope_ms_per_iter(fn, img)
        print(f"{dtype} 4K SAT: {ms:.3f} ms  "
              f"(compile+measure {time.time() - t0:.0f}s)", flush=True)

    # f32 px6 SAT reference point
    spec_f = FilterSpec(
        "SATf", (Dim("y", w), Dim("x", w)),
        (Scan(1, True, 1.0, (1.0,)), Scan(0, True, 1.0, (1.0,))),
        tile_widths=(128, 128),
    )
    imgf = jnp.asarray(rng.standard_normal((w, w)) * 0.01, jnp.float32)

    def fnf(v):
        return dimfuse.apply_filter_fused(spec_f, v, matmul_precision="px6")

    t0 = time.time()
    ms = slope_ms_per_iter(fnf, imgf, scale=1e-6)
    print(f"f32 px6 4K SAT: {ms:.3f} ms  "
          f"(compile+measure {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
