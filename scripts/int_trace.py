"""xplane trace of the 10M segmented int cumsum."""
import sys, os
sys.path.insert(0, ".")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from recfilter_tpu import dimfuse
    from recfilter_tpu.spec import Dim, FilterSpec, Scan
    n = 10_000_000
    spec = FilterSpec("C",(Dim("c",8),Dim("x",n)),(Scan(1,True,1,(1,)),),
                      dtype="int32", tile_widths=(0,4096))
    sig = jnp.asarray(np.random.default_rng(0).integers(-1000,1000,(8,n)), jnp.int32)
    fn = jax.jit(lambda v: dimfuse.apply_filter_fused(spec, v))
    fn(sig).block_until_ready()
    with jax.profiler.trace("/tmp/int_trace"):
        for _ in range(4):
            fn(sig).block_until_ready()
    print("traced")

if __name__ == "__main__":
    main()
