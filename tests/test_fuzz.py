"""Randomized spec fuzzing: the default executor vs the numpy oracle.

Random dims/scans/orders/causalities/borders/tile widths, stable
coefficients, awkward extents — the property the whole engine must hold is
exact oracle equivalence (float32 tolerance) for EVERY expressible filter.
"""

import numpy as np
import pytest

from recfilter_tpu import dimfuse, scan_core
from recfilter_tpu.spec import BorderMode, Dim, FilterSpec, Scan


def _random_spec(rng):
    ndim = rng.integers(1, 4)
    extents = [int(rng.integers(5, 40)) for _ in range(ndim)]
    dims = tuple(Dim(f"d{i}", e) for i, e in enumerate(extents))
    nscan = int(rng.integers(1, 5))
    scans = []
    for _ in range(nscan):
        axis = int(rng.integers(0, ndim))
        order = int(rng.integers(1, 4))
        # stable-ish coefficients: sum |a| < 1 keeps values bounded
        a = rng.uniform(-0.9, 0.9, size=order)
        a = a / max(1.0, 1.2 * np.abs(a).sum())
        scans.append(
            Scan(
                axis,
                bool(rng.integers(0, 2)),
                float(rng.uniform(0.3, 1.4)),
                tuple(float(v) for v in a),
            )
        )
    border = BorderMode.CLAMP if rng.integers(0, 2) else BorderMode.ZERO
    tiles = tuple(int(rng.integers(2, 17)) for _ in range(ndim))
    return FilterSpec(
        "Fz", dims, tuple(scans), border=border, tile_widths=tiles
    )


@pytest.mark.parametrize("seed", range(30))
def test_random_spec_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    spec = _random_spec(rng)
    x = rng.standard_normal(
        tuple(d.extent for d in spec.dims)
    ).astype(np.float32)
    got = np.asarray(dimfuse.apply_filter_fused(spec, x))
    want = scan_core.oracle_apply(spec, x).astype(np.float32)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(
        got / scale, want / scale, rtol=2e-4, atol=2e-4,
        err_msg=f"spec={spec}",
    )


@pytest.mark.parametrize("seed", range(12))
def test_random_streamed_matches_oracle(seed):
    """Streaming executor property: any chunking == in-core result."""
    from recfilter_tpu import streaming

    rng = np.random.default_rng(7000 + seed)
    spec = _random_spec(rng)
    x = rng.standard_normal(
        tuple(d.extent for d in spec.dims)
    ).astype(np.float32)
    axis = int(rng.integers(0, spec.ndim))
    chunk = int(rng.integers(3, max(4, spec.dims[axis].extent)))
    got = streaming.apply_filter_streamed(spec, x, chunk_axis=axis, chunk=chunk)
    want = scan_core.oracle_apply(spec, x).astype(np.float32)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(
        got / scale, want / scale, rtol=2e-4, atol=2e-4,
        err_msg=f"spec={spec} chunk_axis={axis} chunk={chunk}",
    )


@pytest.mark.parametrize("seed", range(12))
def test_random_rotated_chain_matches_oracle(seed):
    """Two single-dim filters chained through rotated layouts == natural."""
    rng = np.random.default_rng(8000 + seed)
    h, w = int(rng.integers(6, 30)), int(rng.integers(6, 30))
    dims = (Dim("y", h), Dim("x", w))
    border = BorderMode.CLAMP if rng.integers(0, 2) else BorderMode.ZERO

    def rand_scans(axis):
        out = []
        for _ in range(int(rng.integers(1, 3))):
            order = int(rng.integers(1, 4))
            a = rng.uniform(-0.9, 0.9, size=order)
            a = a / max(1.0, 1.2 * np.abs(a).sum())
            out.append(Scan(axis, bool(rng.integers(0, 2)),
                            float(rng.uniform(0.3, 1.4)),
                            tuple(float(v) for v in a)))
        return tuple(out)

    tiles = (int(rng.integers(2, 12)), int(rng.integers(2, 12)))
    fx = FilterSpec("fx", dims, rand_scans(1), border=border, tile_widths=tiles)
    fy = FilterSpec("fy", dims, rand_scans(0), border=border, tile_widths=tiles)
    x = rng.standard_normal((h, w)).astype(np.float32)

    r = dimfuse.apply_filter_rotated(fx, x, rot_axes=2)       # (x, y)
    r = dimfuse.apply_filter_rotated(fy, r, rot_axes=2)       # (y, x)

    want = x.astype(np.float64)
    for s in fx.scans + fy.scans:
        want = scan_core.oracle_apply_scan(
            want, s.axis, s.causal, s.feedfwd, s.feedback, border
        )
    want = want.astype(np.float32)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(
        np.asarray(r) / scale, want / scale, rtol=2e-4, atol=2e-4,
        err_msg=f"fx={fx} fy={fy}",
    )


@pytest.mark.parametrize("seed", range(15))
def test_random_fir_band_matches_oracle(seed):
    """Fuzz the banded-FIR kernel: random taps (odd/even support, random
    signs/magnitudes), random extents/rows, every precision grade, with
    and without a (sometimes bogus) tap_scale — vs the f64 oracle."""
    import jax.numpy as jnp

    from recfilter_tpu import fir
    from recfilter_tpu.kernels import fir_band

    rng = np.random.default_rng(900 + seed)
    K = int(rng.integers(2, 60))
    taps = rng.standard_normal(K) * (10.0 ** rng.integers(-2, 2))
    L = int(rng.integers(130, 700))
    q = int(rng.integers(8, 40))
    x = rng.standard_normal((q, L)).astype(np.float32) * 0.1
    want = fir.fir_oracle(x, taps, 1)
    scale = None
    if rng.random() < 0.5:
        # random scale: almost never exact — must silently fall back
        scale = float(10.0 ** rng.integers(0, 3))
    nprod, bound = [(1, 3e-2), (3, 1e-3), (6, 1e-5)][seed % 3]
    rot = bool(rng.random() < 0.5)
    got = np.asarray(fir_band.fir_band_pass(
        jnp.asarray(x), taps, T=128, rot=rot, nprod=nprod,
        interpret=True, tap_scale=scale))
    if rot:
        got = got.T
    scale_ref = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() <= bound * scale_ref, (seed, nprod)
