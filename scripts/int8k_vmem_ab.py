"""A/B: 8K int SAT with the sublane dim full-extent (13MB budget) vs segmented."""
import sys, time, os
import numpy as np
sys.path.insert(0, ".")
from bench import slope_ms_per_iter

def main():
    import jax.numpy as jnp
    from recfilter_tpu import dimfuse
    from recfilter_tpu.spec import Dim, FilterSpec, Scan
    w = 8192
    spec = FilterSpec("S8",(Dim("y",w),Dim("x",w)),
                      (Scan(1,True,1,(1,)),Scan(0,True,1,(1,))),
                      dtype="int32", tile_widths=(128,128))
    img = jnp.asarray(np.random.default_rng(0).integers(-2**24,2**24,(w,w)), jnp.int32)
    # exactness at the raised budget
    got = np.asarray(dimfuse.apply_filter_fused(spec, img))
    want = (np.asarray(img).astype(np.int64).cumsum(1).cumsum(0) & 0xFFFFFFFF)
    assert np.array_equal(got.astype(np.int64) & 0xFFFFFFFF, want), "mismatch"
    print("exact OK", flush=True)
    t0=time.time()
    ms = slope_ms_per_iter(lambda v: dimfuse.apply_filter_fused(spec, v), img)
    print(f"8K SAT budget={os.environ.get('RECFILTER_INTSCAN_VMEM','6M')}: {ms:.3f} ms ({time.time()-t0:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
