"""Unsharp mask: Gaussian blur cascade + pointwise combine (``apps/usm/``).

naive    — blur then separately computed pointwise stage
           (``unsharp_mask_naive.cpp``)
optimized — the pointwise stage fuses into the blur's last kernel; in the
           reference this is a hand ``compute_at`` into the consumer's GPU
           blocks (``unsharp_mask_optimized.cpp:61-71``); under XLA the
           elementwise epilogue fuses automatically when expressed in the
           same jit — so both variants share one code path here and
           "optimized" simply jits the whole pipeline as one program.
"""

from __future__ import annotations

import jax

from .gaussian import gaussian_3x_3y


def unsharp_mask(
    width: int,
    height: int,
    tile_width: int = 0,
    sigma: float = 5.0,
    weight: float = 1.0,
    fused: bool = True,
):
    """Return jittable ``fn(image) -> sharpened`` (``unsharp_mask_*.cpp``)."""
    fc = gaussian_3x_3y(width, height, tile_width, sigma)
    fns = [f.as_func() for f in fc]

    def pipeline(image):
        b = image
        for fn in fns:
            b = fn(b)
        # USM(x,y) = (1+w)*I(x,y) - w*Blur(x,y)
        # (unsharp_mask_optimized.cpp:55-56)
        return (1.0 + weight) * image - weight * b

    if fused:
        return jax.jit(pipeline)
    return pipeline
