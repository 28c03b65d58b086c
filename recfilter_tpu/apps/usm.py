"""Unsharp mask: Gaussian blur cascade + pointwise combine (``apps/usm/``).

naive    — blur then a separately computed pointwise stage
           (``unsharp_mask_naive.cpp``): the combine is its own elementwise
           HBM stream after the last filter pass.
optimized — the pointwise stage fuses into the blur's last kernel; in the
           reference this is a hand ``compute_at`` into the consumer's GPU
           blocks (``unsharp_mask_optimized.cpp:61-71``); here the combine
           is handed to the last filter as a dimfuse EPILOGUE, applied in
           the completion matmul's tile layout so XLA fuses it into the
           dot's output — no extra full-size stream.
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

    # USM(x,y) = (1+w)*I(x,y) - w*Blur(x,y)  (unsharp_mask_optimized.cpp:55-56)
    def combine(blur, image):
        return (1.0 + weight) * image - weight * blur

    if fused:
        fns = [f.as_func() for f in fc[:-1]]
        last = fc[-1].as_func(epilogue=combine)

        def pipeline(image):
            b = image
            for fn in fns:
                b = fn(b)
            return last(b, image)

        return jax.jit(pipeline)

    fns = [f.as_func() for f in fc]

    def pipeline(image):
        b = image
        for fn in fns:
            b = fn(b)
        return combine(b, image)

    return pipeline
