"""Ragged-grid (non-dividing rows) pallas A/B for the int scan kernel."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from bench import slope_ms_per_iter

def main():
    import jax, jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from recfilter_tpu.kernels import int_scan

    rng = np.random.default_rng(0)
    rows, E, lb = 19528, 4096, 128
    x = jnp.asarray(rng.integers(-1000, 1000, (rows, E)), jnp.int32)

    ragged = pl.pallas_call(
        partial(int_scan._lane_kernel, scans=((1, 1, True),), E=E,
                roll_mode=None),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(-(-rows // lb),),
        in_specs=[pl.BlockSpec((lb, E), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((lb, E), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )
    got = np.asarray(ragged(x))
    xn = np.asarray(x).astype(np.int64)
    want = xn.cumsum(1) & 0xFFFFFFFF
    ok = np.array_equal(got.astype(np.int64) & 0xFFFFFFFF, want)
    print("ragged exact:", ok, flush=True)
    t0 = time.time()
    ms = slope_ms_per_iter(ragged, x)
    print(f"ragged-19528: {ms:.3f} ms  ({time.time()-t0:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
