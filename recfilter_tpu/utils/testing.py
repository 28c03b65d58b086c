"""Test and benchmark harness helpers.

Rebuild of the header-only helpers in ``lib/recfilter.h``:
``generate_random_image`` (``:691-741``, which despite its name fills with
ones by default, MIN=MAX=1, so failures are human-readable — a SAT becomes a
ramp), and ``CheckResult`` / ``CheckResultVerbose`` (``:793-855``) computing
max and mean relative-% error against a reference array.
"""

from __future__ import annotations

import numpy as np


def generate_random_image(*extents, dtype=np.float32, lo=1, hi=1, seed=0):
    """All-ones image by default (reference MIN=MAX=1, ``lib/recfilter.h:694``);
    pass lo/hi for genuinely random contents."""
    shape = tuple(int(e) for e in extents)
    if lo == hi:
        return np.full(shape, lo, dtype=dtype)
    rng = np.random.default_rng(seed)
    if np.issubdtype(np.dtype(dtype), np.integer):
        return rng.integers(lo, hi + 1, size=shape).astype(dtype)
    return (lo + (hi - lo) * rng.random(shape)).astype(dtype)


class _CheckStats:
    def __init__(self, ref: np.ndarray, out: np.ndarray, verbose: bool):
        ref = np.asarray(ref, dtype=np.float64)
        out = np.asarray(out, dtype=np.float64)
        assert ref.shape == out.shape, f"shape mismatch {ref.shape} vs {out.shape}"
        diff = out - ref
        denom = np.sum(np.abs(ref))
        scale = 100.0 / denom if denom > 0 else 100.0
        self.max_error = float(np.max(np.abs(diff)) * scale)
        self.mean_error = float(np.mean(np.abs(diff)) * scale)
        self.verbose = verbose
        self.ref = ref
        self.out = out

    def __repr__(self) -> str:
        lines = []
        if self.verbose and self.ref.size <= 1024:
            lines.append(f"Reference:\n{self.ref}\n")
            lines.append(f"Obtained:\n{self.out}\n")
        lines.append(
            f"Max relative error = {self.max_error:.6e} %\n"
            f"Mean relative error = {self.mean_error:.6e} %"
        )
        return "".join(lines)


def CheckResult(ref, out) -> _CheckStats:
    """Max/mean relative-% error summary (``lib/recfilter.h:793-820``)."""
    return _CheckStats(ref, out, verbose=False)


def CheckResultVerbose(ref, out) -> _CheckStats:
    """Verbose variant that also prints small arrays
    (``lib/recfilter.h:822-855``)."""
    return _CheckStats(ref, out, verbose=True)


def assert_close(ref, out, max_rel_pct=1e-3, msg=""):
    """Pytest-friendly wrapper: assert max relative error below a bound."""
    stats = CheckResult(ref, out)
    assert stats.max_error <= max_rel_pct, (
        f"{msg} max relative error {stats.max_error:.3e}% "
        f"exceeds bound {max_rel_pct:.3e}% "
        f"(mean {stats.mean_error:.3e}%)"
    )
    return stats
