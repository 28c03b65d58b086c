"""Phase-by-phase timing of the segmented integer scan at 10M samples."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from bench import slope_ms_per_iter

def main():
    import jax, jax.numpy as jnp
    from recfilter_tpu.kernels import int_scan

    n, C = 2441, 4096          # E = 9,998,336 — no pad phase
    rows = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-1000, 1000, (rows, n, C)), jnp.int32)

    def kernel_only(v):
        return int_scan.int_unit_dim_pass(v, [(1, 1, True)], 2, False)

    def reduction_only(v):
        return jnp.broadcast_to(
            jnp.sum(v, axis=2, dtype=jnp.int32)[..., None], v.shape)

    def correction_only(v):
        inc = jnp.ones((rows, n, 1), jnp.int32)
        return v + inc

    def full(v):
        return int_scan._segmented_unit_scan(
            v.reshape(rows, n * C), (1, 1, True), 1, False
        ).reshape(rows, n, C)

    for name, fn in [("kernel", kernel_only), ("reduce", reduction_only),
                     ("correct", correction_only), ("full-seg", full)]:
        t0 = time.time()
        ms = slope_ms_per_iter(fn, x)
        print(f"{name}: {ms:.3f} ms  ({time.time()-t0:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
