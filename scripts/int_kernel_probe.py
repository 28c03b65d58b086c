"""Isolate the int unit-scan kernel cost by shape/variant."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from bench import slope_ms_per_iter

def main():
    import jax.numpy as jnp
    from recfilter_tpu.kernels import int_scan
    from recfilter_tpu import dimfuse
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.integers(-1000, 1000, (4096, 4096)), jnp.int32)

    cases = [
        ("lane-4k", lambda v: int_scan.int_unit_dim_pass(v, [(1,1,True)], 1, False), x4),
        ("sublane-4k", lambda v: int_scan.int_unit_dim_pass(v, [(1,1,True)], 0, False), x4),
    ]
    spec = FilterSpec("S",(Dim("y",4096),Dim("x",4096)),
                      (Scan(1,True,1,(1,)),Scan(0,True,1,(1,))),
                      dtype="int32", tile_widths=(128,128))
    cases.append(("sat-4k-full", lambda v: dimfuse.apply_filter_fused(spec, v), x4))
    x10 = jnp.asarray(rng.integers(-1000, 1000, (8, 2441, 4096)), jnp.int32)
    cases.append(("lane-10M", lambda v: int_scan.int_unit_dim_pass(v, [(1,1,True)], 2, False), x10))

    for name, fn, arg in cases:
        t0 = time.time()
        ms = slope_ms_per_iter(fn, arg)
        print(f"{name}: {ms:.3f} ms  ({time.time()-t0:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
