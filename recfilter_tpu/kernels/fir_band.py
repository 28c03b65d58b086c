"""Banded tile-FIR Pallas kernel: small-support FIR banks in 2 HBM touches.

The einsum formulation of the banded operator (``fir.fir_pass_last``) pays
structural overhead on both ends of the precision range: in the compensated
split modes the bf16 operand chunks and the per-product partial sums
materialize in HBM (measured 7.5 ms for a 4K box at px6 — 12x the
throughput mode), and even in throughput mode the neighbour-strip einsums
and pad/slice glue keep it ~2x off bandwidth. Here the whole pass is one
kernel: each grid step owns a (Lb, kT·T) block of rows x tiles plus two
one-tile neighbour strips (read amplification (kT+2)/kT), splits the f32
data into bf16 chunks IN VMEM, and emits every sub-tile as a handful of
(T,T)x(T,Lb) MXU dots against the trace-time-split band matrices — zero
pointwise streams, zero chunk materialization, optionally emitting rotated.

Band algebra: out[tile τ] = W0·x[τ] + Wm·x[τ−1] + Wp·x[τ+1], with
W0/Wm/Wp the (T,T) blocks of the banded Toeplitz operator (support must
fit one tile on each side, K ≤ T+1 each way — the gate callers check).
Channel banks (1→C, DoG's dual radius) and signed channel contraction
(C→1, DoG's final difference) ride the same dots.

Precision: ``nprod`` products over bf16 chunk pairs, exactly as
``kernels/completion.py`` (1 = plain bf16 rounding — the throughput and
bf16-storage modes; 3/4/6 = the compensated px grades, 6 = true f32).

Reference analog: the banded pass replaces the SAT + finite-differencing
pipelines of ``apps/box/box_filter.h:21-225`` and the box stages of
``apps/DoG/diff_gauss.cpp:72-110`` (see fir.py's module docstring for why
that trade is TPU-first).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .completion import _nchunks, _prods, _split_const_np, _split_vmem

_VMEM_BUDGET = 6 * 1024 * 1024


def band_blocks(taps: np.ndarray, T: int):
    """(Wm, W0, Wp): the (T, T) blocks of the banded Toeplitz operator
    out[o] = Σ_τ taps[τ]·x[o+τ−P] on tiles of width T, as one (3, T, T)
    stack ordered [prev, cur, next]. Requires P, Q ≤ T."""
    taps = np.asarray(taps, np.float64)
    K = len(taps)
    P = (K - 1) // 2
    Q = K - 1 - P
    if P > T or Q > T:
        raise ValueError("FIR support exceeds the one-tile band")
    W = np.zeros((3, T, T), np.float64)
    for o in range(T):
        for t in range(K):
            g = T + o + t - P  # input lane in the 3-tile window
            W[g // T, o, g % T] = taps[t]
    return W


def _fir_kernel(*refs, ch_pairs, nc: int, rot: bool, kT: int, C: int,
                contract: bool, nblk: int, inv_s=None, P8: int = 0,
                Q8: int = 0):
    """One (Lb, kT·T) block (+ 2 one-tile strips) -> (kT·T, Lb) (rot) or
    (Lb, kT·T) out block, per output channel.

    refs: W_ref, x_ref, xm_ref, xp_ref, o_ref — with a leading C axis on
    the x/o refs when ``contract``/bank applies.

    Corner-dot decomposition: the neighbour tiles only feed the P (resp.
    Q) boundary output rows, so instead of three full (T,T) position dots
    per chunk pair the kernel runs ONE pair-stacked (T, npair·T) dot for
    the current tile plus two skinny (P8/Q8-row) corner dots — MXU cost
    npair·(T+P8+Q8) instead of 3·npair·T MACs per output element (2.7x
    for small supports). The corner outputs pad back onto the block rows
    (rot) / lanes (flat) — 8-row quanta, no misalignment."""
    W_ref, x_ref, xm_ref, xp_ref, o_ref = refs
    g = pl.program_id(1)
    T = xm_ref.shape[-1]
    Cin = x_ref.shape[0] if contract else 1

    # Global-edge masks: the strip index maps clamp at the array ends, so
    # the first block's prev strip and the last block's next strip read
    # duplicate (wrong) tiles — zero them (zero-pad FIR semantics).
    pm = jnp.where(g > 0, 1.0, 0.0).astype(x_ref.dtype)
    nm = jnp.where(g < nblk - 1, 1.0, 0.0).astype(x_ref.dtype)

    def chunks(v):
        return _split_vmem(v, nc)

    if contract:
        xs = [chunks(x_ref[c]) for c in range(Cin)]
        xms = [chunks(xm_ref[c] * pm) for c in range(Cin)]
        xps = [chunks(xp_ref[c] * nm) for c in range(Cin)]
    else:
        xs = [chunks(x_ref[:])]
        xms = [chunks(xm_ref[:] * pm)]
        xps = [chunks(xp_ref[:] * nm)]

    def tile_cat(cin, tau, pairs):
        """Pair-stacked (Lb, npair·T) chunk concat of tile ``tau``
        (tau = -1 / kT selects the neighbour strips)."""
        if tau < 0:
            blocks = [xms[cin][j] for _, j in pairs]
        elif tau >= kT:
            blocks = [xps[cin][j] for _, j in pairs]
        else:
            sl = slice(tau * T, (tau + 1) * T)
            blocks = [xs[cin][j][:, sl] for _, j in pairs]
        return blocks[0] if len(blocks) == 1 else jnp.concatenate(
            blocks, axis=1)

    for co in range(C):
        cat_cache = {}
        for tau in range(kT):
            acc = None
            for cin in range(Cin):
                idx = co * Cin + cin
                pairs = ch_pairs[idx]
                npair = len(pairs)
                key = (cin, tuple(j for _, j in pairs))

                def cat(tt, key=key, cin=cin, pairs=pairs):
                    ck = (key, tt)
                    if ck not in cat_cache:
                        cat_cache[ck] = tile_cat(cin, tt, pairs)
                    return cat_cache[ck]

                wb = W_ref[idx]
                wcur = wb[0:T, :npair * T]
                if rot:
                    dn = (((1,), (1,)), ((), ()))  # (r,npT)x(Lb,npT)->(r,Lb)
                    sub = jax.lax.dot_general(
                        wcur, cat(tau), dn,
                        preferred_element_type=jnp.float32)
                    if P8:
                        tp = jax.lax.dot_general(
                            wb[T:T + P8, :npair * T], cat(tau - 1), dn,
                            preferred_element_type=jnp.float32)
                        sub = sub + jnp.pad(tp, ((0, T - P8), (0, 0)))
                    if Q8:
                        tn = jax.lax.dot_general(
                            wb[T + P8:T + P8 + Q8, :npair * T], cat(tau + 1),
                            dn, preferred_element_type=jnp.float32)
                        sub = sub + jnp.pad(tn, ((T - Q8, 0), (0, 0)))
                else:
                    dn = (((1,), (1,)), ((), ()))  # (Lb,npT)x(r,npT)->(Lb,r)
                    sub = jax.lax.dot_general(
                        cat(tau), wcur, dn,
                        preferred_element_type=jnp.float32)
                    if P8:
                        tp = jax.lax.dot_general(
                            cat(tau - 1), wb[T:T + P8, :npair * T], dn,
                            preferred_element_type=jnp.float32)
                        sub = sub + jnp.pad(tp, ((0, 0), (0, T - P8)))
                    if Q8:
                        tn = jax.lax.dot_general(
                            cat(tau + 1), wb[T + P8:T + P8 + Q8, :npair * T],
                            dn, preferred_element_type=jnp.float32)
                        sub = sub + jnp.pad(tn, ((0, 0), (T - Q8, 0)))
                if inv_s is not None and inv_s[idx] != 1.0:
                    # integer-scaled exact band: undo the channel's scale
                    sub = sub * inv_s[idx]
                acc = sub if acc is None else acc + sub
            if rot:
                blk = acc.astype(o_ref.dtype)
                if C > 1:
                    o_ref[co, tau * T:(tau + 1) * T, :] = blk
                else:
                    o_ref[tau * T:(tau + 1) * T, :] = blk
            else:
                blk = acc.astype(o_ref.dtype)
                if C > 1:
                    o_ref[co, :, tau * T:(tau + 1) * T] = blk
                else:
                    o_ref[:, tau * T:(tau + 1) * T] = blk


def _exact_bf16(v) -> bool:
    """True when every entry of ``v`` is exactly bf16-representable."""
    import ml_dtypes

    v = np.asarray(v, np.float64)
    return bool(np.all(v.astype(ml_dtypes.bfloat16).astype(np.float64) == v))


def exact_band(taps, tap_scale, C: int):
    """Per-channel exact-integer band decision.

    Returns (taps_k, inv_s, exact_flags): for channels whose ``taps·scale``
    snaps to exactly-bf16 integers (the f64 taps carry ~1e-13 convolution
    noise around their rational values m/(2B+1)^n — snap first), taps_k
    holds the scaled integers and inv_s the inverse scale; other channels
    keep their raw taps (inv_s 1.0). None when no channel qualifies or no
    scale was given — channels are decided INDEPENDENTLY, so e.g. DoG's
    B=5 radius gets the reduced product set even though B=9's numerators
    exceed bf16's exact-integer range."""
    if tap_scale is None:
        return None
    taps = np.atleast_2d(np.asarray(taps, np.float64))
    s = np.broadcast_to(np.asarray(tap_scale, np.float64), (C,)).copy()
    taps_k = taps.copy()
    inv_s = [1.0] * C
    exact = [False] * C
    for c in range(C):
        t_scaled = taps[c] * s[c]
        t_snap = np.rint(t_scaled)
        close = np.max(np.abs(t_scaled - t_snap)) <= 1e-6 * max(
            1.0, float(np.max(np.abs(t_snap))))
        if close and _exact_bf16(t_snap):
            taps_k[c] = t_snap
            inv_s[c] = float(1.0 / s[c])
            exact[c] = True
    if not any(exact):
        return None
    return taps_k, inv_s, exact


def fir_band_pass(x, taps, *, T: int, rot: bool, nprod: int = 1,
                  signs=None, contract: bool = False,
                  interpret: bool = False, tap_scale=None):
    """Banded FIR along the last axis of ``x`` via the fused kernel.

    ``x``: (q, L) — or (C, q, L) with ``contract`` (signed channel sum).
    ``taps``: (C, K) bank rows (C output channels when not ``contract``).
    Zero-padded (full-convolution) semantics; L is zero-padded up to the
    internal tile grid and cropped back. Returns (L, q) / (C, L, q) when
    ``rot`` else (q, L) / (C, q, L).

    ``tap_scale`` (scalar or per-channel): a factor making the taps exactly
    bf16-representable — iterated boxes are integers/(2B+1)^n, so scale
    (2B+1)^n gives small integers. The W operand then needs ONE bf16 chunk
    instead of 2-3, halving the compensated modes' MXU products (px6: 6→3
    at identical accuracy — the dropped terms are exactly zero); the scale
    is undone by one per-channel multiply on the accumulated block. Ignored
    (generic chunking) when the scaled taps are not exactly representable.
    """
    taps = np.atleast_2d(np.asarray(taps, np.float64))
    C = taps.shape[0]
    if signs is not None:
        taps = taps * np.asarray(signs, np.float64)[:, None]
    if contract:
        Cin, q, L = x.shape
        assert Cin == C
        Cout = 1
    else:
        q, L = x.shape
        Cin, Cout = 1, C

    n = -(-L // T)
    kT = min(8, n)
    ntot = -(-n // kT) * kT
    nblk = ntot // kT
    padL = ntot * T - L

    nc = _nchunks(nprod)
    # Exact-integer band: with a valid tap_scale every W chunk beyond the
    # first is exactly zero, so only the x-chunk products remain.
    exact = exact_band(taps, tap_scale, Cout * Cin) if nc > 1 else None
    gen_pairs = _prods(nprod)
    red_pairs = [(0, j) for j in range(nc)]
    if exact is not None:
        taps_k, inv_s, flags = exact
        ch_pairs = [red_pairs if f else gen_pairs for f in flags]
    else:
        taps_k = taps
        inv_s = None
        ch_pairs = [gen_pairs] * (Cout * Cin)
    wslots = max(len(p) for p in ch_pairs)
    K = taps_k.shape[1]
    P = (K - 1) // 2
    Q = K - 1 - P
    P8 = -(-P // 8) * 8 if P else 0
    Q8 = -(-Q // 8) * 8 if Q else 0
    import os

    if os.environ.get("RECFILTER_FIR_FULLWIN", "") == "1":
        # A/B escape hatch: full-window neighbour dots (P8 = Q8 = T makes
        # the corner rows the whole position blocks and the pads no-ops).
        # Measured (box1 4K, scripts/fir_corner_exp.py): corners win px6
        # 0.339 vs 0.491 ms and tie throughput mode 0.271 vs 0.273 — the
        # corner decomposition stays unconditional.
        P8, Q8 = (T if P else 0), (T if Q else 0)
    # W constant: (Cout*Cin, T+P8+Q8, wslots*T) — per channel: rows [0:T]
    # the current-tile block, [T:T+P8] the prev-tile corner rows (only the
    # first P output rows read the previous tile), [T+P8:] the next-tile
    # corner rows [T-Q8:T]; band chunk i of the channel's pair p at lanes
    # [p*T, (p+1)*T) (reduced exact-integer channels leave tail slots 0).
    Wk = np.zeros((Cout * Cin, T + P8 + Q8, wslots * T), np.float32)
    for c in range(Cout * Cin):
        Wb = band_blocks(taps_k[c], T)  # (3, T, T) float64 [prev, cur, next]
        rows = np.concatenate(
            [Wb[1]]
            + ([Wb[0][:P8]] if P8 else [])
            + ([Wb[2][T - Q8:]] if Q8 else []), axis=0)
        Ws = _split_const_np(rows, nc)
        for p, (i, _) in enumerate(ch_pairs[c]):
            Wk[c, :, p * T:(p + 1) * T] = np.asarray(Ws[i], np.float32)
    import ml_dtypes
    Wk = Wk.astype(ml_dtypes.bfloat16)  # numpy operand constant on purpose
    # (completion._split_const: jnp constants leak under shard_map grad)

    # Row-block size from the VMEM budget: in-block + chunks + out-block.
    # Prefer an Lb that DIVIDES q — the q pad + crop otherwise copy the
    # whole array twice around the kernel (xplane-measured 0.39 ms at 4K,
    # MORE than the two FIR kernels themselves).
    bpe = 4 if x.dtype == jnp.float32 else 2
    per_line = kT * T * (bpe + 2 * nc + 4) * max(Cin, Cout)
    cap = max(8, min((_VMEM_BUDGET // per_line) // 8 * 8, 1024))
    Lb = 0
    if q >= 8:
        for d in range(min(cap, q) - min(cap, q) % 8, 7, -8):
            if q % d == 0:
                Lb = d
                break
    if not Lb:
        Lb = cap if q > cap else max(8, ((q + 7) // 8) * 8)
    qp = -(-q // Lb) * Lb
    grid = (qp // Lb, nblk)
    if contract:
        in_specs = [
            pl.BlockSpec((Cout * Cin, T + P8 + Q8, wslots * T),
                         lambda l, g: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, Lb, kT * T), lambda l, g: (0, l, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, Lb, T),
                         lambda l, g: (0, l, jnp.maximum(g * kT - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, Lb, T),
                         lambda l, g: (0, l,
                                       jnp.minimum(g * kT + kT, ntot - 1)),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((Cout * Cin, T + P8 + Q8, wslots * T),
                         lambda l, g: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lb, kT * T), lambda l, g: (l, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lb, T),
                         lambda l, g: (l, jnp.maximum(g * kT - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lb, T),
                         lambda l, g: (l, jnp.minimum(g * kT + kT, ntot - 1)),
                         memory_space=pltpu.VMEM),
        ]
    odt = x.dtype
    if rot:
        if Cout > 1:
            out_shape = jax.ShapeDtypeStruct((Cout, ntot * T, qp), odt)
            out_spec = pl.BlockSpec((Cout, kT * T, Lb),
                                    lambda l, g: (0, g, l),
                                    memory_space=pltpu.VMEM)
        else:
            out_shape = jax.ShapeDtypeStruct((ntot * T, qp), odt)
            out_spec = pl.BlockSpec((kT * T, Lb), lambda l, g: (g, l),
                                    memory_space=pltpu.VMEM)
    else:
        if Cout > 1:
            out_shape = jax.ShapeDtypeStruct((Cout, qp, ntot * T), odt)
            out_spec = pl.BlockSpec((Cout, Lb, kT * T),
                                    lambda l, g: (0, l, g),
                                    memory_space=pltpu.VMEM)
        else:
            out_shape = jax.ShapeDtypeStruct((qp, ntot * T), odt)
            out_spec = pl.BlockSpec((Lb, kT * T), lambda l, g: (l, g),
                                    memory_space=pltpu.VMEM)

    def _run(x):
        if padL:
            cfg = [(0, 0)] * x.ndim
            cfg[-1] = (0, padL)
            x = jnp.pad(x, cfg)
        if qp != q:
            cfg = [(0, 0)] * x.ndim
            cfg[1 if contract else 0] = (0, qp - q)  # q axis
            x = jnp.pad(x, cfg)
        y = pl.pallas_call(
            partial(_fir_kernel, ch_pairs=ch_pairs, nc=nc, rot=rot, kT=kT,
                    C=Cout, contract=contract, nblk=nblk, inv_s=inv_s,
                    P8=P8, Q8=Q8),
            out_shape=out_shape,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            interpret=interpret,
        )(Wk, x, x, x)  # strip specs pick the neighbour tiles of x

        # Crop the tile-grid padding.
        if rot:
            y = y[..., :L, :] if ntot * T != L else y
            y = y[..., :q] if qp != q else y
        else:
            y = y[..., :q, :] if qp != q else y
            y = y[..., :L] if ntot * T != L else y
        return y

    # VJP via the einsum twin: the banded pass is linear in x; jax
    # transposes the shifted-tile einsums natively (pallas_call has no
    # autodiff rule). f32-grade gradients regardless of nprod.
    # numpy, not jnp — bwd closure constants (completion._expand_stack).
    Wf = [np.asarray(band_blocks(taps[c], T), np.float32)
          for c in range(Cout * Cin)]

    def _ref(x):
        xf = x.astype(jnp.float32)
        if padL:
            cfg = [(0, 0)] * x.ndim
            cfg[-1] = (0, padL)
            xf = jnp.pad(xf, cfg)
        Xt = xf.reshape(xf.shape[:-1] + (ntot, T))
        zt = jnp.zeros_like(Xt[..., :1, :])
        prv = jnp.concatenate([zt, Xt[..., :-1, :]], axis=-2)
        nxt = jnp.concatenate([Xt[..., 1:, :], zt], axis=-2)
        outs = []
        for co in range(Cout):
            acc = None
            for ci in range(Cin):
                Wb = Wf[co * Cin + ci]
                Xc = Xt[ci] if contract else Xt
                Pc = prv[ci] if contract else prv
                Nc = nxt[ci] if contract else nxt
                hi = jax.lax.Precision.HIGHEST  # match the kernel's grade
                t = (jnp.einsum("ot,qnt->qno", Wb[1], Xc, precision=hi)
                     + jnp.einsum("ot,qnt->qno", Wb[0], Pc, precision=hi)
                     + jnp.einsum("ot,qnt->qno", Wb[2], Nc, precision=hi))
                acc = t if acc is None else acc + t
            outs.append(acc.reshape(acc.shape[:-2] + (ntot * T,)))
        y = outs[0] if Cout == 1 else jnp.stack(outs)
        y = y[..., :L] if padL else y
        if rot:
            y = jnp.swapaxes(y, -1, -2)
        return y.astype(x.dtype)

    f = jax.custom_vjp(_run)
    f.defvjp(lambda x: (_run(x), x),
             lambda x0, ct: jax.vjp(_ref, x0)[1](ct))
    return f(x)


def fir_band_ok(T: int, L: int, taps, q: int) -> bool:
    """Static gate: Mosaic's 128-lane tile, band within one tile each way,
    and enough rows to fill sublanes."""
    taps = np.atleast_2d(np.asarray(taps))
    K = taps.shape[1]
    P = (K - 1) // 2
    return T == 128 and max(P, K - 1 - P) <= T and q >= 8 and L >= T
