"""A/B: non-last-axis single-dim pass at default precision — rows-pass
kernels vs the conv-lowered einsum form (round-4 regression hunt: the
staged cascade app measured 0.35 ms at round-3 README time, 0.70 now)."""
import sys, time, os
import numpy as np
sys.path.insert(0, ".")
from bench import slope_ms_per_iter

def main():
    import jax.numpy as jnp
    from recfilter_tpu import dimfuse, overlap2d
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    w = 4096
    qs = (0.8, (0.4, -0.1, 0.05))
    spec_y = FilterSpec("gy", (Dim("y", w), Dim("x", w)),
                        (Scan(0, True, qs[0], qs[1]),
                         Scan(0, False, qs[0], qs[1])),
                        tile_widths=(128, 128))
    spec_x = FilterSpec("gx", (Dim("y", w), Dim("x", w)),
                        (Scan(1, True, qs[0], qs[1]),
                         Scan(1, False, qs[0], qs[1])),
                        tile_widths=(128, 128))
    img = jnp.asarray(np.random.default_rng(0).standard_normal((w, w)) * .01,
                      jnp.float32)

    def t(fn):
        t0 = time.time()
        ms = slope_ms_per_iter(fn, img, scale=1e-6)
        return ms, time.time() - t0

    ms, s = t(lambda v: dimfuse.apply_filter_fused(
        spec_x, v, matmul_precision="default"))
    print(f"x-dim (lane, einsum default): {ms:.3f} ms ({s:.0f}s)", flush=True)
    ms, s = t(lambda v: dimfuse.apply_filter_fused(
        spec_y, v, matmul_precision="default"))
    print(f"y-dim default (current route): {ms:.3f} ms ({s:.0f}s)", flush=True)
    orig = overlap2d.fused_rows_px
    overlap2d.fused_rows_px = lambda *a, **k: None
    try:
        ms, s = t(lambda v: dimfuse.apply_filter_fused(
            spec_y, v, matmul_precision="default"))
    finally:
        overlap2d.fused_rows_px = orig
    print(f"y-dim default (rows kernels OFF): {ms:.3f} ms ({s:.0f}s)",
          flush=True)

if __name__ == "__main__":
    main()
