"""Summed-area table (``apps/summed_table/summed_table.cpp``):
first-order causal scans in x and y with coefficients {1, 1}, 2-D tiled."""

from __future__ import annotations

import numpy as np

from ..api import RecFilter
from ..spec import Dim
from ..planner import auto_tile_width


def summed_table(width: int, height: int, tile_width: int = 0,
                 dtype="float32") -> RecFilter:
    """Build the SAT filter (``summed_table.cpp:41-46``)."""
    tile_width = tile_width or auto_tile_width(min(width, height))
    x = Dim("x", width)
    y = Dim("y", height)
    F = RecFilter("Summed_table")
    F[y, x] = np.zeros((height, width), dtype=dtype)
    F.add_filter(+x, [1.0, 1.0])
    F.add_filter(+y, [1.0, 1.0])
    F.split(x, tile_width, y, tile_width)
    return F
