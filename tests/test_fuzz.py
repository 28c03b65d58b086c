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
