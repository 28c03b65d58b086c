"""Differentiable recursive filters: traced coefficients, trainable by grad.

No reference analog — the reference bakes float coefficients into generated
code at metaprogramming time (``lib/recfilter.cpp:353-372``). Here the same
blocked algebra is rebuilt with *traced* coefficient tensors:

  * the impulse matrix B and state matrix R are constructed inside the trace
    with ``lax.scan`` recurrences over rows (differentiable w.r.t. b0, a);
  * the cross-tile carry recurrence runs as ``jax.lax.associative_scan`` over
    affine pairs (W, b) — log-depth, no host-precomputed W powers.

This turns any RecFilter into a trainable layer (IIR deconvolution,
coefficient fitting, learned separable blurs — the S5/Mamba-style linear
recurrence layer specialized to image filtering). Used by
``LearnableRecFilter`` and tested by fitting coefficients with optax.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .spec import BorderMode, FilterSpec


def impulse_matrix_jnp(feedfwd, feedback, tile_width: int, clamp: bool = False):
    """Traced-coefficient twin of ``coeffs.impulse_matrix``.

    ``feedback`` is a (k,) jnp vector; returns (T, T). Rows built by a
    ``lax.scan`` over output positions with the last-k rows as carry.
    """
    a = jnp.asarray(feedback)
    k = a.shape[0]
    T = int(tile_width)
    eye = jnp.eye(T)

    def step(carry, e_y):
        rows, row0, y = carry
        row = feedfwd * e_y
        for j in range(k):
            valid = rows[j]  # row y-j-1 (zeros if off the top)
            if clamp:
                # off-the-top taps read: raw input e_0 at y==0, else row 0
                off = jnp.where(y == 0, eye[0], row0)
                tap = jnp.where(y - j - 1 >= 0, valid, off)
            else:
                tap = valid  # zero-init carry realizes the zero border
            row = row + a[j] * tap
        rows = jnp.concatenate([row[None], rows[:-1]], axis=0)
        row0 = jnp.where(y == 0, row, row0)
        return (rows, row0, y + 1), row

    init = (jnp.zeros((k, T)), jnp.zeros(T), jnp.asarray(0))
    _, B = jax.lax.scan(step, init, eye)
    return B


def state_matrix_jnp(feedback, tile_width: int):
    """Traced-coefficient twin of ``coeffs.state_matrix``: (T, k)."""
    a = jnp.asarray(feedback)
    k = a.shape[0]
    T = int(tile_width)
    # Initial direct contributions: row y gets a[x+y] at column x (x+y < k).
    idx = jnp.arange(k)[None, :] + jnp.arange(T)[:, None]  # (T, k)
    direct = jnp.where(idx < k, a[jnp.clip(idx, 0, k - 1)], 0.0)

    def step(rows, d_y):
        row = d_y
        for j in range(k):
            row = row + a[j] * rows[j]
        rows = jnp.concatenate([row[None], rows[:-1]], axis=0)
        return rows, row

    _, R = jax.lax.scan(step, jnp.zeros((k, k)), direct)
    return R


def blocked_scan_learnable(
    x,  # (L, w)
    feedfwd,
    feedback,  # (k,) traced
    tile_width: int,
    clamp: bool = False,
):
    """Causal blocked scan with traced coefficients.

    Same algebra as ``tiling.blocked_scan_last_axis`` but every static matrix
    is rebuilt inside the trace and the carry chain runs as an
    ``associative_scan`` over (W, b) affine pairs.
    """
    L, w = x.shape
    a = jnp.asarray(feedback)
    k = a.shape[0]
    T = int(min(tile_width, w))
    n = -(-w // T)
    pad = n * T - w

    B = impulse_matrix_jnp(feedfwd, a, T, clamp=False)
    R = state_matrix_jnp(a, T)
    # P·B rows (reversed last k) and W = P·R without materializing P.
    PB = B[T - 1 - jnp.arange(k), :]  # (k, T)
    W = R[T - 1 - jnp.arange(k), :]  # (k, k)

    xt = x
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
    xt = xt.reshape(L, n, T)

    b = jnp.einsum("kt,lnt->nlk", PB, xt)  # (n, L, k) tile-major for the scan
    if clamp:
        Bf = impulse_matrix_jnp(feedfwd, a, T, clamp=True)
        PBf = Bf[T - 1 - jnp.arange(k), :]
        b = b.at[0].set(jnp.einsum("kt,lt->lk", PBf, xt[:, 0]))

    # Completed states via associative scan over affine maps s ↦ W s + b_t.
    A_stack = jnp.broadcast_to(W, (n, k, k))

    def combine_pairs(c1, c2):
        A1, b1 = c1
        A2, b2 = c2
        A = jnp.einsum("n...ij,n...jk->n...ik", A2, A1)
        bb = jnp.einsum("n...ij,n...lj->n...li", A2, b1) + b2
        return A, bb

    _, s = jax.lax.associative_scan(combine_pairs, (A_stack, b), axis=0)
    # incoming state of tile t is the completed state of tile t-1
    s_prev = jnp.concatenate([jnp.zeros_like(s[:1]), s[:-1]], axis=0)

    y = jnp.einsum("ts,lns->lnt", B, xt) + jnp.einsum(
        "tk,nlk->lnt", R, s_prev
    )
    if clamp:
        y = y.at[:, 0].set(jnp.einsum("ts,ls->lt", Bf, xt[:, 0]))

    y = y.reshape(L, n * T)
    if pad:
        y = y[:, :w]
    return y


def apply_scan_learnable(
    x, axis: int, causal: bool, feedfwd, feedback,
    tile_width: int = 32, border: str = BorderMode.ZERO,
):
    """Differentiable single-scan application along ``axis``."""
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    if not causal:
        x = jnp.flip(x, axis=-1)
    y = blocked_scan_learnable(
        x.reshape(-1, shape[-1]), feedfwd, feedback, tile_width,
        clamp=border == BorderMode.CLAMP,
    )
    y = y.reshape(shape)
    if not causal:
        y = jnp.flip(y, axis=-1)
    return jnp.moveaxis(y, -1, axis)


class LearnableRecFilter:
    """A RecFilter whose coefficients are a trainable pytree.

    ``init_params(spec)`` extracts {scan_i: {"b0": (), "a": (k,)}} from a
    FilterSpec; ``apply(params, x)`` runs the filter differentiably. Works
    under jit/grad/vmap and inside shard_map.
    """

    def __init__(self, spec: FilterSpec, tile_width: int = 32):
        self.spec = spec
        self.tile_width = tile_width

    def init_params(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        return {
            f"scan{i}": {
                "b0": jnp.asarray(s.feedfwd, dtype=jnp.float32),
                "a": jnp.asarray(s.feedback, dtype=jnp.float32),
            }
            for i, s in enumerate(self.spec.scans)
        }

    def apply(self, params, x):
        x = x.astype(jnp.float32)
        for i, s in enumerate(self.spec.scans):
            p = params[f"scan{i}"]
            x = apply_scan_learnable(
                x, s.axis, s.causal, p["b0"], p["a"],
                tile_width=self.tile_width, border=self.spec.border,
            )
        return x
