"""Headline benchmark: 3rd-order Gaussian IIR blur on a 4K image, one chip.

Prints ONE JSON line:
  {"metric": "gaussian_iir_4k_mpix_s", "value": N, "unit": "Mpix/s",
   "vs_baseline": R}

The reference publishes no absolute numbers (BASELINE.md), so ``vs_baseline``
is the fraction of the HBM-bandwidth roofline achieved: the fused executor
needs 2 HBM touches per pixel per dimension pass (2 passes, f32) = 16
bytes/pixel; v5e HBM ≈ 819 GB/s → roofline ≈ 51.2 Gpix/s.

Extra context (per-app numbers, MiP/s in the reference's unit) goes to
stderr; stdout carries only the JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import recfilter_tpu as rf
    from recfilter_tpu.utils import timing

    h = w = 4096
    sigma = 5.0
    iters = 20

    wts = rf.gaussian_weights(sigma, 3)
    x = rf.Dim("x", w)
    y = rf.Dim("y", h)
    F = rf.RecFilter("GaussianIIR")
    F[y, x] = np.zeros((h, w), dtype=np.float32)
    F.add_filter(+x, wts)
    F.add_filter(-x, wts)
    F.add_filter(+y, wts)
    F.add_filter(-y, wts)
    F.split(x, 32, y, 32)

    fn = jax.jit(F.as_func())
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((h, w)), dtype=jnp.float32
    )

    # Warm up (compile), then time. Chain each iteration's output into the
    # next input so no caching/overlap layer can elide or parallelize the
    # iterations (the recursive Gaussian has ~unit DC gain, so values stay
    # bounded).
    jax.block_until_ready(fn(img))
    t0 = time.perf_counter()
    out = img
    for _ in range(iters):
        out = fn(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) * 1000.0

    pixels = h * w * iters
    mpix_s = timing.mpix_per_sec(ms, pixels)
    mip_s = timing.throughput(ms, pixels)

    # Roofline: 2 dimension passes × (read + write) × 4 B = 16 B/pixel.
    hbm_gb_s = 819.0  # v5e
    roofline_mpix_s = hbm_gb_s * 1e9 / 16.0 / 1e6
    vs = mpix_s / roofline_mpix_s

    print(
        f"[bench] platform={jax.default_backend()} {h}x{w} gaussian3 "
        f"{ms/iters:.3f} ms/iter  {mpix_s:.1f} Mpix/s ({mip_s:.1f} MiP/s)  "
        f"roofline {roofline_mpix_s:.0f} Mpix/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "gaussian_iir_4k_mpix_s",
                "value": round(mpix_s, 1),
                "unit": "Mpix/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
