"""Is the 10M overhead the pad/crop, or the kernel itself?"""
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
    x = jnp.asarray(rng.integers(-1000, 1000, (19584, 4096)), jnp.int32)

    # exact-divisible 2-D input, no pad/crop/reshape around the kernel
    def kern_direct(v):
        return int_scan.int_unit_dim_pass(v, [(1,1,True)], 1, False)

    # raw pallas_call, no wrapper at all
    E, lb = 4096, 128
    raw = pl.pallas_call(
        partial(int_scan._lane_kernel, scans=((1,1,True),), E=E,
                roll_mode=None),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0] // lb,),
        in_specs=[pl.BlockSpec((lb, E), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((lb, E), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )
    for name, fn, arg in [("divisible-19584", kern_direct, x),
                          ("raw-pallas", raw, x)]:
        t0 = time.time()
        ms = slope_ms_per_iter(fn, arg)
        print(f"{name}: {ms:.3f} ms  ({time.time()-t0:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
