"""On-chip timing of the segmented integer scans (round 4).

8K int32 SAT (the sublane dim exceeds the full-extent VMEM gate) and a
10M-sample int32 cumsum (audio-scale — the limb gain gate fails there,
so before the segmented variant this was device-sequential lax.scan).

    python scripts/int_large_bench.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import slope_ms_per_iter  # noqa: E402


def main():
    import jax.numpy as jnp

    from recfilter_tpu import dimfuse
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    rng = np.random.default_rng(0)

    # on-chip exactness first (Mosaic roll semantics must match interpret):
    # one segmented lane case + one single-kernel sublane case, vs numpy
    from recfilter_tpu.kernels import int_scan

    xs = rng.integers(-1000, 1000, (8, 70_001)).astype(np.int32)
    got = np.asarray(int_scan.int_unit_dim_pass(
        jnp.asarray(xs), [(1, 1, True), (1, -1, False)], 1, False))
    v = xs.astype(np.int64).cumsum(1)
    w2 = np.zeros_like(v)
    prev = np.zeros(v.shape[0], np.int64)
    for i in range(v.shape[1] - 1, -1, -1):
        prev = v[:, i] - prev
        w2[:, i] = prev
    assert np.array_equal(got.astype(np.int64) & 0xFFFFFFFF,
                          w2 & 0xFFFFFFFF), "on-chip lane mismatch"
    ys = rng.integers(-1000, 1000, (4000, 256)).astype(np.int32)
    got = np.asarray(int_scan.int_unit_dim_pass(
        jnp.asarray(ys), [(2, 1, True)], 0, False))
    assert np.array_equal(
        got.astype(np.int64) & 0xFFFFFFFF,
        ((2 * ys.astype(np.int64)).cumsum(0)) & 0xFFFFFFFF
    ), "on-chip sublane mismatch"
    print("on-chip exactness: OK", flush=True)

    w = 8192
    spec = FilterSpec(
        "SAT8K", (Dim("y", w), Dim("x", w)),
        (Scan(1, True, 1, (1,)), Scan(0, True, 1, (1,))),
        dtype="int32", tile_widths=(128, 128),
    )
    img = jnp.asarray(rng.integers(-2 ** 24, 2 ** 24, (w, w)), jnp.int32)
    t0 = time.time()
    ms = slope_ms_per_iter(lambda v: dimfuse.apply_filter_fused(spec, v),
                           img)
    print(f"int32 8K SAT: {ms:.3f} ms  {w * w / ms / 1e3:.0f} Mpix/s  "
          f"(compile+measure {time.time() - t0:.0f}s)", flush=True)

    n = 10_000_000
    spec1 = FilterSpec(
        "CUM10M", (Dim("c", 8), Dim("x", n)),
        (Scan(1, True, 1, (1,)),),
        dtype="int32", tile_widths=(0, 4096),
    )
    sig = jnp.asarray(rng.integers(-1000, 1000, (8, n)), jnp.int32)
    t0 = time.time()
    ms = slope_ms_per_iter(lambda v: dimfuse.apply_filter_fused(spec1, v),
                           sig)
    print(f"int32 8x10M cumsum: {ms:.3f} ms  "
          f"{8 * n / ms / 1e6:.1f} Gsamples/s  "
          f"(compile+measure {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
