"""IIR coefficient derivation: Gaussian approximation, integral images, overlap.

Rebuild of ``lib/iir_coeff.{h,cpp}``: van Vliet–Young pole rescaling for
recursive Gaussian approximation (``lib/iir_coeff.cpp:38-177``), closed-form
Gaussian/derivative/integral (``:179-203``), iterated-box width selection
(``:205-220``), integral-image binomial coefficients (``:222-234``), and the
z-domain polynomial multiply that merges two cascaded filters into one
higher-order filter (``overlap_feedback_coeff``, ``:236-263``).

All host-side scalar math (float64 internally). The closed-form Gaussian
helpers also accept jnp arrays and stay traceable.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np


def _factorial(k: int) -> int:
    assert k >= 0
    r = 1
    for i in range(1, k + 1):
        r *= i
    return r


def _binomial_coeff(n: int, i: int, r: float) -> float:
    """i-th coefficient of the expansion of (1 - r·x)^n
    (``lib/iir_coeff.cpp:18-21``)."""
    n_choose_i = _factorial(n) // (_factorial(i) * _factorial(n - i))
    return ((-r) ** i) * float(n_choose_i)


def qs(s: float) -> float:
    """Recursive-filter scaling factor for Gaussian sigma ``s``
    (``lib/iir_coeff.cpp:38-40``; van Vliet et al. 1998)."""
    return 0.00399341 + 0.4715161 * s


def pole_rescale(d: complex, s: float) -> complex:
    """Rescale a complex z-plane pole for sigma ``s``
    (``lib/iir_coeff.cpp:60-63``)."""
    q = qs(s)
    r = abs(d) ** (1.0 / q)
    th = math.atan2(d.imag, d.real) / q
    return complex(r * math.cos(th), r * math.sin(th))


def pole_rescale_real(d: float, s: float) -> float:
    """Rescale a real z-plane pole for sigma ``s``
    (``lib/iir_coeff.cpp:83-85``)."""
    return d ** (1.0 / qs(s))


def weights1(s: float) -> "tuple[float, float]":
    """First-order recursive Gaussian weights (b0, a1)
    (``lib/iir_coeff.cpp:103-108``)."""
    d3 = 1.86543
    d = pole_rescale_real(d3, s)
    b0 = -(1.0 - d) / d
    a1 = -1.0 / d
    return b0, a1


def weights2(s: float) -> "tuple[float, float, float]":
    """Second-order recursive Gaussian weights (b0, a1, a2)
    (``lib/iir_coeff.cpp:127-136``)."""
    d1 = complex(1.41650, 1.00829)
    d = pole_rescale(d1, s)
    n2 = abs(d) ** 2
    re = d.real
    b0 = (1.0 - 2.0 * re + n2) / n2
    a1 = -2.0 * re / n2
    a2 = 1.0 / n2
    return b0, a1, a2


def weights3(s: float) -> "tuple[float, float, float, float]":
    """Third-order weights = first-order ∘ second-order
    (``lib/iir_coeff.cpp:150-159``)."""
    b10, a11 = weights1(s)
    b20, a21, a22 = weights2(s)
    a1 = a11 + a21
    a2 = a11 * a21 + a22
    a3 = a11 * a22
    b0 = b10 * b20
    return b0, a1, a2, a3


def gaussian_weights(sigma: float, order: int) -> List[float]:
    """[b0, a1..ak] for a recursive Gaussian of the given order.

    Matches ``gaussian_weights`` (``lib/iir_coeff.cpp:162-177``) including its
    sign convention: the internal a_i are negated so the returned feedback
    coefficients plug directly into ``add_filter`` scans
    ``v[x] = b0 v[x] + Σ a_j v[x-j-1]``.
    """
    if order == 1:
        w = list(weights1(sigma))
    elif order == 2:
        w = list(weights2(sigma))
    else:
        w = list(weights3(sigma))
    return [w[0]] + [-a for a in w[1:]]


def gaussian(x, mu: float, sigma: float):
    """Gaussian pdf; works on floats and jnp arrays
    (``lib/iir_coeff.cpp:179-196``)."""
    import jax.numpy as jnp

    y = (jnp.asarray(x, dtype=jnp.float32) - mu) / sigma
    return jnp.exp(-0.5 * y * y) / (sigma * 2.50662827463)


def gauss_derivative(x, mu: float, sigma: float):
    """d/dx Gaussian (``lib/iir_coeff.cpp:184-200``)."""
    import jax.numpy as jnp

    xx = jnp.asarray(x, dtype=jnp.float32)
    y = (xx - mu) / sigma
    return (mu - xx) * jnp.exp(-0.5 * y * y) / (sigma**3 * 2.50662827463)


def gauss_integral(x, mu: float, sigma: float):
    """Gaussian CDF (``lib/iir_coeff.cpp:189-203``)."""
    import jax.scipy.special as jss
    import jax.numpy as jnp

    xx = jnp.asarray(x, dtype=jnp.float32)
    return 0.5 * (1.0 + jss.erf((xx - mu) / (sigma * 1.41421356237)))


def gaussian_box_filter(k: int, sigma: float) -> int:
    """Width of a box filter so that k iterated applications approximate a
    Gaussian of the given sigma (``lib/iir_coeff.cpp:205-220``)."""
    total = 0.0
    alpha = 0.005
    sum_limit = int(math.floor((float(k) - 1.0) / 2.0))
    for i in range(sum_limit + 1):
        f = float(_factorial(k) // (_factorial(i) * _factorial(k - i)))
        p = ((-1.0) ** i) / float(_factorial(k - 1))
        total += p * f * ((float(k) / 2.0 - i) ** (k - 1))
    total = math.sqrt(2.0 * math.pi) * (total + alpha) * sigma
    return int(math.ceil(total))


def integral_image_coeff(n: int) -> List[float]:
    """[b0=1, a1..an] for an n-th order integral image: feedback is the
    negated binomial expansion of (1-x)^n (``lib/iir_coeff.cpp:222-234``)."""
    coeff = [0.0] * (n + 1)
    coeff[0] = 1.0
    for i in range(1, n + 1):
        coeff[i] = -1.0 * _binomial_coeff(n, i, 1.0)
    return coeff


def overlap_feedback_coeff(
    a: Sequence[float], b: Sequence[float]
) -> List[float]:
    """Merge two cascaded filters' feedback coefficient lists into one.

    z-domain: multiply the denominator polynomials (1 - Σ a_j z^-j) and
    (1 - Σ b_j z^-j); return the negated tail of the product
    (``lib/iir_coeff.cpp:236-263``). Used by
    ``overlap_to_higher_order_filter`` (``lib/reorder.cpp:231-381``).
    """
    pa = [1.0] + [-float(x) for x in a]
    pb = [1.0] + [-float(x) for x in b]
    c = [0.0] * (len(pa) + len(pb) - 1)
    for i in range(len(c)):
        for j in range(i + 1):
            if j < len(pa) and i - j < len(pb):
                c[i] += pa[j] * pb[i - j]
    return [-x for x in c[1:]]


def reference_gaussian(image: np.ndarray, sigma: float) -> np.ndarray:
    """Brute-force true-Gaussian 2-D convolution oracle with zero padding,
    normalized over in-bounds weights (``lib/iir_coeff.h:79-100``).

    Slow; test-sized images only.
    """
    img = np.asarray(image, dtype=np.float64)
    h, w = img.shape[:2]
    out = np.zeros_like(img)
    rad = int(math.ceil(4.0 * sigma))
    xs = np.arange(-rad, rad + 1)
    g = np.exp(-0.5 * (xs / sigma) ** 2)
    g2 = np.outer(g, g)
    g2 /= g2.sum()
    for i in range(h):
        for j in range(w):
            i0, i1 = max(0, i - rad), min(h, i + rad + 1)
            j0, j1 = max(0, j - rad), min(w, j + rad + 1)
            ker = g2[i0 - i + rad : i1 - i + rad, j0 - j + rad : j1 - j + rad]
            out[i, j] = np.sum(img[i0:i1, j0:j1] * ker) / ker.sum()
    return out
