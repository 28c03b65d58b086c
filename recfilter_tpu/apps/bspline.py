"""B-spline interpolation prefilters (``apps/bspline/``).

Bicubic: 1st-order causal+anticausal per dimension with pole a = 2-√3,
coefficients {1+a, -a} (``bicubic_filter.cpp:36-57``). Biquintic: 2nd-order,
as one overlapped filter or cascaded by dimension
(``biquintic_overlapped_filter.cpp``, ``biquintic_cascaded_filter.cpp``).
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from ..api import RecFilter
from ..spec import Dim
from ..planner import auto_tile_width


def bicubic(width: int, height: int, tile_width: int = 0) -> RecFilter:
    """Bicubic prefilter: 4 first-order scans, overlapped
    (``bicubic_filter.cpp:36-57``)."""
    tile_width = tile_width or auto_tile_width(min(width, height))
    a = 2.0 - math.sqrt(3.0)
    coeff = [1.0 + a, -a]
    x = Dim("x", width)
    y = Dim("y", height)
    F = RecFilter("Bicubic")
    F.set_clamped_image_border()
    F[y, x] = np.zeros((height, width), dtype=np.float32)
    F.add_filter(+x, coeff)
    F.add_filter(-x, coeff)
    F.add_filter(+y, coeff)
    F.add_filter(-y, coeff)
    F.split_all_dimensions(tile_width)
    return F


def _biquintic_coeff():
    """Quintic B-spline z-transform poles (Unser et al.): the prefilter is a
    2nd-order causal-anticausal filter per dimension with poles z1, z2 =
    roots of the quintic B-spline characteristic polynomial."""
    z1 = math.sqrt(135.0 / 2.0 - math.sqrt(17745.0 / 4.0)) + math.sqrt(105.0 / 4.0) - 13.0 / 2.0
    z2 = math.sqrt(135.0 / 2.0 + math.sqrt(17745.0 / 4.0)) - math.sqrt(105.0 / 4.0) - 13.0 / 2.0
    # Normalized 2nd-order filter: feedback (z1+z2, -z1*z2), unit-gain
    # feedforward (1-z1)(1-z2).
    b0 = (1.0 - z1) * (1.0 - z2)
    a1 = z1 + z2
    a2 = -z1 * z2
    return [b0, a1, a2]


def biquintic_overlapped(width: int, height: int, tile_width: int = 0) -> RecFilter:
    """Biquintic prefilter, all scans in one overlapped filter
    (``biquintic_overlapped_filter.cpp``)."""
    tile_width = tile_width or auto_tile_width(min(width, height))
    coeff = _biquintic_coeff()
    x = Dim("x", width)
    y = Dim("y", height)
    F = RecFilter("Biquintic")
    F.set_clamped_image_border()
    F[y, x] = np.zeros((height, width), dtype=np.float32)
    F.add_filter(+x, coeff)
    F.add_filter(-x, coeff)
    F.add_filter(+y, coeff)
    F.add_filter(-y, coeff)
    F.split_all_dimensions(tile_width)
    return F


def biquintic_cascaded(width: int, height: int, tile_width: int = 0) -> List[RecFilter]:
    """Biquintic prefilter cascaded by dimension
    (``biquintic_cascaded_filter.cpp``)."""
    tile_width = tile_width or auto_tile_width(min(width, height))
    F = biquintic_overlapped(width, height, tile_width)
    fc = F.cascade_by_dimension()
    for f in fc:
        f.split_all_dimensions(tile_width)
    return fc
