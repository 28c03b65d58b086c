"""Headline benchmark: 3rd-order Gaussian IIR blur on a 4K image, one chip.

Prints ONE JSON line:
  {"metric": "gaussian_iir_4k_mpix_s", "value": N, "unit": "Mpix/s",
   "vs_baseline": R}

The reference publishes no absolute numbers (BASELINE.md), so ``vs_baseline``
is the fraction of the HBM-bandwidth roofline achieved: the fused executor
needs 2 HBM touches per pixel per dimension pass (2 passes, f32) = 16
bytes/pixel; v5e HBM ≈ 819 GB/s → roofline ≈ 51.2 Gpix/s.

Round 3: the shipping 2-D px executor is the 3-touch overlapped pipeline
(12 B/px — ``overlap2d.fused_2d_px``), so bandwidth is no longer the
binding constraint at the default precision: true-f32 (px6) costs 12
single-pass bf16 MXU products per pixel-pass-pair ≈ 0.26 ms of pure MXU at
4K, which sits at the 16 B/px roofline itself. ``vs_baseline`` keeps the
16 B/px definition for cross-round comparability; the JSON also reports
the executor's actual bytes/px so the MXU-vs-DMA balance is explicit.

Note: the chained fori_loop adds one full-image loop-carry copy per
iteration (~0.09 ms at 4K, visible in xplane traces) that a production
single-dispatch call does not pay — the reported number is therefore a
conservative lower bound on single-call throughput.

Timing methodology: host wall-clock over a remote/tunneled TPU is unreliable
(dispatch may be lazy; fetches carry RPC latency), so iterations run INSIDE
one jitted ``lax.fori_loop`` chaining each output into the next input, a
scalar reduction is fetched to force execution, and the per-iteration time is
the SLOPE between two iteration counts — tunnel constants cancel. Validated
against an MXU matmul of known FLOPs (within 80% of peak).
"""

import json
import sys
import time

import numpy as np


def _build_filter(h, w, sigma=5.0, tile=128):
    import recfilter_tpu as rf

    wts = rf.gaussian_weights(sigma, 3)
    x = rf.Dim("x", w)
    y = rf.Dim("y", h)
    F = rf.RecFilter("GaussianIIR")
    F[y, x] = np.zeros((h, w), dtype=np.float32)
    F.add_filter(+x, wts)
    F.add_filter(-x, wts)
    F.add_filter(+y, wts)
    F.add_filter(-y, wts)
    F.split(x, tile, y, tile)
    return F


def make_loop(fn, scale=None, per_body=1):
    """One jitted chained-iteration loop; the trip count is a traced argument
    so a single (slow, remote) compile serves every measurement point.

    ``scale`` (a tiny float, e.g. 1e-7) bounds pipelines that GROW when
    iterated on their own output (integrator stages — SAT, the box/DoG
    double integrals — or rounding-noise amplification in throughput mode):
    the body output is multiplied by ``scale**per_body`` ONCE per loop body,
    so iterates stay bounded or underflow to zero for any trip count (zeros
    cost the same bandwidth as data). Applying it per BODY rather than per
    application matters for the Pallas-kernel modes: XLA cannot fuse an
    elementwise multiply into a pallas_call's output, so a per-application
    scale costs a full extra HBM stream per application (~0.17 ms at 4K,
    measured) — per body it fuses into the while-loop carry copy the
    harness already pays. Within one body the compositions run unscaled;
    per_body <= 4 keeps even the 4K SAT iterates within f32 range.

    ``per_body`` composes fn that many times per loop body: XLA inserts one
    full-size loop-carry copy per while-loop iteration (~0.09 ms at 4K,
    xplane-verified; a production single-dispatch call never pays it), so
    composing k applications per body amortizes the artifact to 1/k. The
    trip count still means BODY iterations — divide the slope by k."""
    import jax

    body_scale = None if scale is None else float(scale) ** per_body

    @jax.jit
    def loop(x, n):
        def body(i, v):
            for _ in range(per_body):
                v = fn(v)
            return v if body_scale is None else body_scale * v

        out = jax.lax.fori_loop(0, n, body, x)
        first = out[(0,) * out.ndim]
        last = out[(-1,) * out.ndim]
        return first + last

    return loop


def slope_ms_per_iter(fn, img, min_window_ms=80.0, repeats=3, scale=None,
                      per_body=1):
    """ms per application of fn, from the slope between two trip counts
    (tunnel dispatch/fetch constants cancel).

    The trip-count spread is sized so the extra device time dwarfs RPC
    jitter (≥ ``min_window_ms``), and the median of ``repeats`` slopes is
    returned."""
    import jax.numpy as jnp

    loop = make_loop(fn, scale=scale, per_body=per_body)
    float(loop(img, jnp.int32(1)))  # warm up + compile

    def timed(n):
        t0 = time.perf_counter()
        s = float(loop(img, jnp.int32(n)))
        dt = (time.perf_counter() - t0) * 1000.0
        assert np.isfinite(s), "benchmark produced non-finite output"
        return dt

    # Rough estimate to size the window.
    rough = max((timed(64) - timed(2)) / 62.0, 1e-4)
    spread = int(min(max(min_window_ms / rough, 50), 20000))
    slopes = []
    for _ in range(repeats):
        t1, t2 = timed(2), timed(2 + spread)
        slopes.append((t2 - t1) / spread)
    return max(float(np.median(slopes)) / per_body, 1e-6)


def main():
    import jax
    import jax.numpy as jnp

    from recfilter_tpu.utils import timing

    h = w = 4096
    F = _build_filter(h, w, tile=128)
    # The headline measures the SHIPPING DEFAULT configuration: px6 —
    # true-f32 accuracy (1.4e-6 max rel err vs the f64 oracle at 4K,
    # matching the reference's float32 SNR bar) through the VMEM-split
    # completion/tails kernels. Round 1 benchmarked the loose throughput
    # mode (matmul_precision="default", ~5e-2 err — would fail the
    # reference's own CheckResult); that mode remains available and is
    # reported on stderr for context. See README's precision matrix.
    fn = F.as_func()
    F_fast = _build_filter(h, w, tile=128)
    F_fast.set_plan(matmul_precision="default")
    fn_fast = F_fast.as_func()
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((h, w)) * 0.01,
        dtype=jnp.float32,
    )

    # Self-calibrated roofline: measure streaming bandwidth with a Pallas
    # copy kernel. (A plain `v * c` loop is strength-reduced by XLA across
    # fori_loop iterations and reports fictitious multi-TB/s rates; the
    # kernel cannot be folded. Measured ≈ 796 GB/s ≈ the v5e spec.)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.0001

    def _copy(v):
        return pl.pallas_call(
            _copy_kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            grid=(h // 128,),
            in_specs=[pl.BlockSpec((128, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
        )(v)

    # Calibrate with per_body=1: composing chained copies per loop body
    # measured an unphysical 1314 GB/s (above the 819 GB/s chip spec —
    # XLA appears to elide interior chain buffers), while the plain loop
    # reproduces the spec (~700-800 GB/s). The plain loop may include a
    # loop-carry copy, making this calibration conservative (reported
    # vs_baseline is then an upper bound on the true roofline fraction).
    copy_ms = slope_ms_per_iter(_copy, img)
    hbm_gb_s = 2.0 * h * w * 4 / (copy_ms * 1e-3) / 1e9

    # per_body=8 amortizes the while-loop carry-copy harness artifact
    # (one full-image copy per body, ~0.09 ms at 4K) to 1/8. The headline
    # Gaussian is a stable low-pass (iterates on its own output decay), so
    # unlike the integrator apps it needs no scale and tolerates any k.
    ms = slope_ms_per_iter(fn, img, per_body=8)
    pixels = h * w
    mpix_s = timing.mpix_per_sec(ms, pixels)
    mip_s = timing.throughput(ms, pixels)
    ms_fast = slope_ms_per_iter(fn_fast, img, per_body=8)

    # Roofline: 2 dimension passes × (read + write) × 4 B = 16 B/pixel.
    roofline_mpix_s = hbm_gb_s * 1e9 / 16.0 / 1e6
    vs = mpix_s / roofline_mpix_s

    print(
        f"[bench] platform={jax.default_backend()} {h}x{w} gaussian3 "
        f"default(px6, true-f32) {ms:.3f} ms/iter  {mpix_s:.1f} Mpix/s "
        f"({mip_s:.1f} MiP/s)  [throughput mode: {ms_fast:.3f} ms = "
        f"{pixels / ms_fast / 1e3:.0f} Mpix/s]  measured-BW "
        f"{hbm_gb_s:.0f} GB/s  roofline {roofline_mpix_s:.0f} Mpix/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "gaussian_iir_4k_mpix_s",
                "value": round(mpix_s, 1),
                "unit": "Mpix/s",
                "vs_baseline": round(vs, 4),
                # Round 2 changed what the headline measures: the SHIPPING
                # DEFAULT (px6, true-f32 — 1.4e-6 max rel err, the
                # reference's correctness bar), not round 1's loose
                # throughput mode (~5e-2 err, reported here for context).
                "precision_mode": "px6 (true-f32 default)",
                "pipeline": "3-touch overlapped (12 B/px; MXU-bound at px6)",
                "throughput_mode_mpix_s": round(pixels / ms_fast / 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
